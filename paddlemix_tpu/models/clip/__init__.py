from .configuration import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from .modeling import (
    CLIPModel,
    CLIPModule,
    CLIPTextModel,
    CLIPTextModelWithProjection,
    CLIPTextTransformer,
    CLIPVisionTransformer,
    clip_contrastive_loss,
)
from .tokenizer import CLIPTokenizer
