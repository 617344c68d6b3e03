from .modeling import CogVLMConfig, CogVLMForCausalLM
