"""DDPM ancestral sampler (reference ppdiffusers/schedulers/scheduling_ddpm.py)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import Scheduler, SchedulerConfig, make_betas, predicted_x0, spaced_timesteps


@dataclasses.dataclass
class DDPMConfig(SchedulerConfig):
    model_type = "ddpm"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    variance_type: str = "fixed_small"  # fixed_small | fixed_large


class DDPMState(NamedTuple):
    timesteps: jnp.ndarray
    prev_timesteps: jnp.ndarray
    num_inference_steps: int


class DDPMScheduler(Scheduler):
    config_class = DDPMConfig

    def set_timesteps(self, num_inference_steps: int) -> DDPMState:
        ts = spaced_timesteps(self.config, num_inference_steps)
        step = self.config.num_train_timesteps // num_inference_steps
        return DDPMState(jnp.asarray(ts, jnp.int32), jnp.asarray(ts - step, jnp.int32),
                         num_inference_steps)

    def step(self, state: DDPMState, model_output, i, sample, key=None):
        cfg = self.config
        t = state.timesteps[i]
        prev_t = state.prev_timesteps[i]
        acp = self.alphas_cumprod
        alpha_prod_t = acp[t]
        alpha_prod_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1.0 - alpha_prod_t
        current_alpha = alpha_prod_t / alpha_prod_prev
        current_beta = 1.0 - current_alpha

        x0 = predicted_x0(model_output, sample, alpha_prod_t, cfg.prediction_type)
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
        xt_coeff = jnp.sqrt(current_alpha) * (1.0 - alpha_prod_prev) / beta_prod_t
        prev_sample = x0_coeff * x0 + xt_coeff * sample

        if cfg.variance_type == "fixed_large":
            variance = current_beta
        else:
            variance = (1.0 - alpha_prod_prev) / beta_prod_t * current_beta
        variance = jnp.clip(variance, 1e-20, None)
        if key is not None:
            noise = jax.random.normal(key, sample.shape, dtype=jnp.float32).astype(sample.dtype)
            prev_sample = prev_sample + jnp.where(prev_t >= 0, jnp.sqrt(variance), 0.0) * noise
        return prev_sample.astype(sample.dtype), state
