"""ControlNet training (reference ppdiffusers/examples/controlnet): the SD
UNet is frozen; only the ControlNet branch trains. Batches carry latents,
text context and the conditioning image."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset
from paddlemix_tpu.diffusers import DDPMScheduler
from paddlemix_tpu.diffusers.models import ControlNetModel, UNet2DConditionModel


def make_controlnet_loss_fn(unet, controlnet, scheduler):
    frozen_unet = jax.tree_util.tree_map(jax.lax.stop_gradient, unet.params)

    def loss_fn(params, batch, rng):
        lat = batch["latents"]
        ctx = batch["encoder_hidden_states"]
        cond = batch["conditioning"]
        b = lat.shape[0]
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (b,), 0,
                               scheduler.config.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = scheduler.add_noise(lat, noise, t)
        down_res, mid_res = controlnet.module.apply(
            {"params": params}, noisy, t, ctx, cond)
        pred = unet.module.apply(
            {"params": frozen_unet}, noisy, t, ctx,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    return loss_fn


def main():
    from paddlemix_tpu.trainer import Trainer, TrainingArguments

    ckpt = sys.argv[1]
    unet = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet")
    controlnet = ControlNetModel.from_unet(unet) if hasattr(
        ControlNetModel, "from_unet") else ControlNetModel.from_pretrained(
        ckpt, subfolder="controlnet")
    scheduler = DDPMScheduler.from_pretrained(ckpt, subfolder="scheduler")
    rng = np.random.RandomState(0)
    data = MapDataset([{
        "latents": rng.randn(64, 64, 4).astype(np.float32),
        "encoder_hidden_states": rng.randn(77, 768).astype(np.float32),
        "conditioning": rng.rand(512, 512, 3).astype(np.float32),
    } for _ in range(256)])
    args = TrainingArguments(output_dir="output/controlnet",
                             learning_rate=1e-5, max_steps=50_000,
                             logging_steps=20, save_steps=5_000)
    Trainer(model=controlnet, args=args,
            loss_fn=make_controlnet_loss_fn(unet, controlnet, scheduler),
            train_dataloader=DataLoader(data, batch_size=4, shuffle=True)).train()


if __name__ == "__main__":
    main()
