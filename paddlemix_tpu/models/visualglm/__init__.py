from .modeling import (
    ChatGLMConfig,
    ChatGLMForCausalLM,
    VisualGLMConfig,
    VisualGLMForConditionalGeneration,
)
