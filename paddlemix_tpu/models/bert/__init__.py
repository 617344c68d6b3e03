from .modeling import (
    BertConfig,
    BertModel,
    RobertaSeriesModelWithTransformation,
    XLMRobertaModel,
)
