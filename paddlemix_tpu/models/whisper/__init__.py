from .modeling import WhisperConfig, WhisperForConditionalGeneration, sinusoids
