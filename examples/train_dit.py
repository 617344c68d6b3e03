"""Class-conditional DiT training (reference ppdiffusers/examples/DiT:
class_conditional_image_generation/train with TP + recompute). Latents +
labels -> epsilon-prediction DDPM loss; jax.checkpoint rematerializes blocks
when memory-bound; parallelism comes from TrainingArguments degrees."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset
from paddlemix_tpu.diffusers import DDPMScheduler
from paddlemix_tpu.diffusers.models import DiTConfig, DiTModel
from paddlemix_tpu.trainer import Trainer, TrainingArguments


def make_dit_loss_fn(model, scheduler):
    acp = scheduler.alphas_cumprod

    def loss_fn(params, batch, rng):
        lat = batch["latents"]
        labels = batch["labels"]
        b = lat.shape[0]
        k_t, k_n, k_d = jax.random.split(rng, 3)
        t = jax.random.randint(k_t, (b,), 0, len(acp))
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = scheduler.add_noise(lat, noise, t)
        pred = model.module.apply({"params": params}, noisy, t, labels,
                                  rng={"dropout": k_d} if False else None)
        pred = pred[..., : lat.shape[-1]]  # learn-sigma: first half = eps
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    return loss_fn


def main():
    cfg = DiTConfig() if len(sys.argv) < 2 else DiTConfig.from_pretrained(sys.argv[1])
    model = DiTModel.from_config(cfg)
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    rng = np.random.RandomState(0)
    s = cfg.sample_size
    data = MapDataset([{"latents": rng.randn(s, s, cfg.in_channels).astype(np.float32),
                        "labels": np.int32(rng.randint(cfg.num_classes))}
                       for _ in range(512)])
    args = TrainingArguments(output_dir="output/dit", learning_rate=1e-4,
                             max_steps=400_000, logging_steps=50,
                             save_steps=10_000, benchmark=True)
    Trainer(model=model, args=args, loss_fn=make_dit_loss_fn(model, scheduler),
            train_dataloader=DataLoader(data, batch_size=16, shuffle=True)).train()


if __name__ == "__main__":
    main()
