from .lora import (
    LoraConfig,
    load_lora,
    lora_init,
    lora_loss_fn,
    merge_lora_into_model,
    merge_params,
    save_lora,
)
