from .modeling import QwenVLConfig, QwenVLForConditionalGeneration, Resampler
