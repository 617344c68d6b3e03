from .modeling import IXC2Config, IXC2ForCausalLM, PLoRALinear
