"""HunyuanDiT fine-tuning (reference ppdiffusers/examples/HunyuanDiT:
hunyuan trainer over dual CLIP+mT5 text streams with v-prediction DDPM).
Latents + both text-encoder states -> v-prediction loss through the pjit
Trainer; parallelism/recompute come from TrainingArguments degrees.

Usage: python examples/train_hunyuan_dit.py [config_dir]
Random latents/text stand in for the data plane (no checkpoints offline) —
swap the MapDataset for a recipe dataset to train for real.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset
from paddlemix_tpu.diffusers import DDPMScheduler
from paddlemix_tpu.diffusers.models.hunyuan_dit import (
    HunyuanDiTConfig,
    HunyuanDiTModel,
)
from paddlemix_tpu.trainer import Trainer, TrainingArguments


def make_hunyuan_loss_fn(model, scheduler):
    """v-prediction MSE (the reference HunyuanDiT trains with
    prediction_type=v_prediction)."""
    num_train = scheduler.config.num_train_timesteps

    def loss_fn(params, batch, rng):
        lat = batch["latents"].astype(jnp.float32)
        b = lat.shape[0]
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (b,), 0, num_train)
        noise = jax.random.normal(k_n, lat.shape, jnp.float32)
        noisy = scheduler.add_noise(lat, noise, t)
        pred = model.module.apply(
            {"params": params}, noisy.astype(model.dtype), t,
            batch["clip_states"].astype(model.dtype), batch["clip_mask"],
            batch["t5_states"].astype(model.dtype), batch["t5_mask"],
        ).astype(jnp.float32)
        pred = pred[..., : lat.shape[-1]]  # learn-sigma head: first half
        target = scheduler.get_velocity(lat, noise, t)
        return jnp.mean((pred - target) ** 2)

    return loss_fn


def main():
    import os

    if os.environ.get("HYDIT_TINY") == "1":  # CI smoke
        cfg = HunyuanDiTConfig(sample_size=8, hidden_size=32, num_heads=2,
                               depth=2, in_channels=4, text_len=4,
                               text_states_dim=16, text_len_t5=4,
                               text_states_dim_t5=16)
    else:
        cfg = (HunyuanDiTConfig() if len(sys.argv) < 2
               else HunyuanDiTConfig.from_pretrained(sys.argv[1]))
    model = HunyuanDiTModel.from_config(cfg)
    scheduler = DDPMScheduler(num_train_timesteps=1000)

    rng = np.random.RandomState(0)
    s = cfg.sample_size
    data = MapDataset([{
        "latents": rng.randn(s, s, cfg.in_channels).astype(np.float32),
        "clip_states": rng.randn(cfg.text_len,
                                 cfg.text_states_dim).astype(np.float32),
        "clip_mask": np.ones((cfg.text_len,), np.int32),
        "t5_states": rng.randn(cfg.text_len_t5,
                               cfg.text_states_dim_t5).astype(np.float32),
        "t5_mask": np.ones((cfg.text_len_t5,), np.int32),
    } for _ in range(256)])

    import os as _os

    args = TrainingArguments(output_dir="output/hunyuan_dit",
                             learning_rate=1e-5,
                             max_steps=int(_os.environ.get("HYDIT_STEPS",
                                                           100_000)),
                             logging_steps=1
                             if _os.environ.get("HYDIT_TINY") == "1"
                             else 50,
                             save_steps=0
                             if _os.environ.get("HYDIT_TINY") == "1"
                             else 10_000,
                             benchmark=True)
    Trainer(model=model, args=args,
            loss_fn=make_hunyuan_loss_fn(model, scheduler),
            train_dataloader=DataLoader(data, batch_size=4,
                                        shuffle=True)).train()


if __name__ == "__main__":
    main()
