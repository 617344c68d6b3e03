from .lora import (
    LoraConfig,
    load_lora,
    lora_init,
    lora_loss_fn,
    merge_lora_into_model,
    merge_params,
    save_lora,
)
from .ia3 import IA3Config, ia3_init, ia3_loss_fn
from .ia3 import merge_params as ia3_merge_params
from .adalora import (
    AdaLoraConfig,
    adalora_init,
    adalora_loss_fn,
    allocator_init,
    allocator_update,
)
from .adalora import merge_params as adalora_merge_params
from .prefix import (
    PrefixTuningConfig,
    PromptEncoderConfig,
    concat_prefix_kv,
    p_tuning_encode,
    p_tuning_init,
    prefix_encode,
    prefix_init,
    prefix_past_key_values,
)
from .tuners import (
    LoHaConfig,
    LoKrConfig,
    OFTConfig,
    PromptTuningConfig,
    apply_prompt,
    loha_init,
    loha_merge,
    lokr_init,
    lokr_merge,
    oft_init,
    oft_merge,
    peft_loss_fn,
    prompt_init,
)
