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
from .eva import (
    EVACLIP,
    EVACLIPConfig,
    EVAVisionConfig,
    EVAVisionTransformer,
    EVAVisionTransformerModule,
    vision_rope_2d,
)
