from .modeling import (
    LlavaConfig,
    LlavaForConditionalGeneration,
    LlavaModule,
    MMProjector,
    llava_loss,
)
