"""DDIM scheduler (reference ppdiffusers/schedulers/scheduling_ddim.py),
as a pure-function solver over an explicit state pytree."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, predicted_eps, predicted_x0, spaced_timesteps


@dataclasses.dataclass
class DDIMConfig(SchedulerConfig):
    model_type = "ddim"
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True
    thresholding: bool = False
    eta: float = 0.0


class DDIMState(NamedTuple):
    timesteps: jnp.ndarray       # (N,) int32, descending
    prev_timesteps: jnp.ndarray  # (N,) int32
    num_inference_steps: int


class DDIMScheduler(Scheduler):
    config_class = DDIMConfig

    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        ts = spaced_timesteps(self.config, num_inference_steps)
        step = self.config.num_train_timesteps // num_inference_steps
        prev = ts - step
        return DDIMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            prev_timesteps=jnp.asarray(prev, jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    def step(self, state: DDIMState, model_output, i, sample, key=None):
        cfg = self.config
        t = state.timesteps[i]
        prev_t = state.prev_timesteps[i]
        acp = self.alphas_cumprod
        alpha_prod_t = acp[t]
        final_alpha = jnp.asarray(1.0 if cfg.set_alpha_to_one else float(acp[0]))
        alpha_prod_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], final_alpha)

        x0 = predicted_x0(model_output, sample, alpha_prod_t, cfg.prediction_type)
        eps = predicted_eps(model_output, sample, alpha_prod_t, cfg.prediction_type)
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        beta_prod_prev = 1.0 - alpha_prod_prev
        variance = (beta_prod_prev / (1.0 - alpha_prod_t)) * (1.0 - alpha_prod_t / alpha_prod_prev)
        sigma = cfg.eta * jnp.sqrt(jnp.maximum(variance, 0.0))
        dir_xt = jnp.sqrt(jnp.maximum(beta_prod_prev - sigma ** 2, 0.0)) * eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * x0 + dir_xt
        if cfg.eta > 0.0 and key is not None:
            noise = jax.random.normal(key, sample.shape, dtype=jnp.float32).astype(sample.dtype)
            prev_sample = prev_sample + sigma * noise
        return prev_sample.astype(sample.dtype), state
