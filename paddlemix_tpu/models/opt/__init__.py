from .modeling import OPTConfig, OPTForCausalLM, OPTModule
