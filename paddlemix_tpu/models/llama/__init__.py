from .configuration import LlamaConfig
from .modeling import (
    KVCache,
    LlamaForCausalLM,
    LlamaModule,
    SamplingConfig,
    greedy_generate,
    sample_token,
)
