"""Latent Consistency Model scheduler (reference
ppdiffusers/schedulers/scheduling_lcm.py)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, predicted_x0


@dataclasses.dataclass
class LCMConfig(SchedulerConfig):
    model_type = "lcm"
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0
    clip_sample: bool = False


class LCMState(NamedTuple):
    timesteps: jnp.ndarray
    num_inference_steps: int


class LCMScheduler(Scheduler):
    config_class = LCMConfig

    def set_timesteps(self, num_inference_steps: int) -> LCMState:
        n = self.config.num_train_timesteps
        k = n // self.config.original_inference_steps
        lcm_origin = np.asarray(range(1, self.config.original_inference_steps + 1)) * k - 1
        skip = len(lcm_origin) // num_inference_steps
        ts = lcm_origin[::-skip][:num_inference_steps]
        return LCMState(jnp.asarray(ts, jnp.int32), num_inference_steps)

    def _boundary(self, t):
        scaled = t.astype(jnp.float32) / self.config.timestep_scaling
        sigma_data = 0.5
        c_skip = sigma_data ** 2 / (scaled ** 2 + sigma_data ** 2)
        c_out = scaled / jnp.sqrt(scaled ** 2 + sigma_data ** 2)
        return c_skip, c_out

    def step(self, state: LCMState, model_output, i, sample, key=None):
        t = state.timesteps[i]
        acp = self.alphas_cumprod
        alpha_prod_t = acp[t]
        x0 = predicted_x0(model_output.astype(jnp.float32), sample.astype(jnp.float32),
                          alpha_prod_t, self.config.prediction_type)
        c_skip, c_out = self._boundary(t)
        denoised = c_out * x0 + c_skip * sample.astype(jnp.float32)
        # re-noise to the next timestep (except after the final step)
        is_last = i == state.num_inference_steps - 1
        next_t = state.timesteps[jnp.minimum(i + 1, state.num_inference_steps - 1)]
        alpha_next = acp[next_t]
        if key is not None:
            noise = jax.random.normal(key, sample.shape)
            renoised = jnp.sqrt(alpha_next) * denoised + jnp.sqrt(1.0 - alpha_next) * noise
        else:
            renoised = denoised
        prev = jnp.where(is_last, denoised, renoised)
        return prev.astype(sample.dtype), state
