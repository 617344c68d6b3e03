from .modeling import QwenVLConfig, QwenVLForConditionalGeneration
from .visual import (
    QwenVisionConfig,
    QwenVisionTransformer,
    Resampler,
    get_2d_sincos_pos_embed,
)
