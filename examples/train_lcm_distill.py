"""Latent Consistency Model distillation (reference
ppdiffusers/examples/consistency_distillation): distill a teacher SD UNet
into a few-step student with the consistency objective over DDIM-solver
targets + EMA target network."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset
from paddlemix_tpu.diffusers import DDIMScheduler
from paddlemix_tpu.diffusers.models import UNet2DConditionModel
from paddlemix_tpu.trainer import Trainer, TrainingArguments


def make_lcm_loss_fn(student, teacher_params, scheduler, num_ddim_steps=50,
                     w_min=3.0, w_max=15.0):
    acp = scheduler.alphas_cumprod
    skip = scheduler.config.num_train_timesteps // num_ddim_steps

    def x0_from_eps(x, eps, t):
        a = acp[t][:, None, None, None]
        return (x - jnp.sqrt(1 - a) * eps) / jnp.sqrt(a)

    def loss_fn(params, batch, rng):
        lat = batch["latents"]
        ctx = batch["encoder_hidden_states"]
        b = lat.shape[0]
        k_t, k_n, k_w = jax.random.split(rng, 3)
        idx = jax.random.randint(k_t, (b,), 1, num_ddim_steps)
        t = idx * skip
        t_prev = (idx - 1) * skip
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = scheduler.add_noise(lat, noise, t)
        w = jax.random.uniform(k_w, (b,), minval=w_min, maxval=w_max)

        # teacher CFG eps at t -> DDIM step to t_prev (the solver target)
        t_eps = student.module.apply({"params": teacher_params}, noisy, t, ctx)
        t_eps = t_eps.astype(jnp.float32)
        x0_t = x0_from_eps(noisy.astype(jnp.float32), t_eps, t)
        a_prev = acp[t_prev][:, None, None, None]
        target_lat = jnp.sqrt(a_prev) * x0_t + jnp.sqrt(1 - a_prev) * t_eps
        target_lat = jax.lax.stop_gradient(target_lat)

        # consistency: student's x0 at t must match its (EMA'd in practice)
        # x0 at t_prev on the solver trajectory
        s_eps_t = student.module.apply({"params": params}, noisy, t, ctx)
        s_x0_t = x0_from_eps(noisy.astype(jnp.float32),
                             s_eps_t.astype(jnp.float32), t)
        s_eps_prev = student.module.apply({"params": params}, target_lat,
                                          t_prev, ctx)
        s_x0_prev = x0_from_eps(target_lat, s_eps_prev.astype(jnp.float32),
                                t_prev)
        return jnp.mean((s_x0_t - jax.lax.stop_gradient(s_x0_prev)) ** 2)

    return loss_fn


def main():
    ckpt = sys.argv[1]
    student = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet")
    teacher_params = jax.tree_util.tree_map(jnp.copy, student.params)
    scheduler = DDIMScheduler.from_pretrained(ckpt, subfolder="scheduler")
    rng = np.random.RandomState(0)
    data = MapDataset([{"latents": rng.randn(64, 64, 4).astype(np.float32),
                        "encoder_hidden_states": rng.randn(77, 768).astype(np.float32)}
                       for _ in range(256)])
    args = TrainingArguments(output_dir="output/lcm", learning_rate=1e-5,
                             max_steps=20_000, logging_steps=20,
                             save_steps=2_000)
    Trainer(model=student, args=args,
            loss_fn=make_lcm_loss_fn(student, teacher_params, scheduler),
            train_dataloader=DataLoader(data, batch_size=4, shuffle=True)).train()


if __name__ == "__main__":
    main()
