from .modeling import (
    Blip2Config,
    Blip2ForConditionalGeneration,
    Blip2Module,
    QFormer,
    QFormerConfig,
)
