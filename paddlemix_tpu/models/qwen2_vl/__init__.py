from .modeling import (
    Qwen2VLConfig,
    Qwen2VLForConditionalGeneration,
    Qwen2VLVisionConfig,
    Qwen2VisionTransformer,
    get_rope_index,
)
