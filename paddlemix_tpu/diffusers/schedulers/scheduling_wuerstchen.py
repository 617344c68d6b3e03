"""DDPM-Wuerstchen scheduler over continuous t in [0, 1] (reference
ppdiffusers/schedulers/scheduling_ddpm_wuerstchen.py). Unlike the discrete
schedulers, alpha_cumprod is a closed-form cosine of the ratio t, so state is
just the float timestep grid and the step is pure jit-able math."""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ...core.config import BaseConfig


@dataclasses.dataclass
class DDPMWuerstchenConfig(BaseConfig):
    model_type = "ddpm-wuerstchen"
    scaler: float = 1.0
    s: float = 0.008


class WuerstchenState(NamedTuple):
    timesteps: jnp.ndarray  # (num_steps + 1,) float32, descending 1 -> 0
    num_inference_steps: int


class DDPMWuerstchenScheduler:
    config_class = DDPMWuerstchenConfig
    order = 1
    init_noise_sigma = 1.0

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        self.config = config
        self._init_acp = math.cos(config.s / (1 + config.s) * math.pi / 2) ** 2

    @classmethod
    def from_config(cls, config_dict: dict, **overrides):
        return cls(cls.config_class.from_dict(dict(config_dict), **overrides))

    def _alpha_cumprod(self, t):
        cfg = self.config
        if cfg.scaler > 1:
            t = 1 - (1 - t) ** cfg.scaler
        elif cfg.scaler < 1:
            t = t ** cfg.scaler
        acp = jnp.cos((t + cfg.s) / (1 + cfg.s) * math.pi / 2) ** 2 / self._init_acp
        return jnp.clip(acp, 0.0001, 0.9999)

    def set_timesteps(self, num_inference_steps: Optional[int] = None,
                      timesteps: Optional[Sequence[float]] = None) -> WuerstchenState:
        if timesteps is None:
            ts = jnp.linspace(1.0, 0.0, num_inference_steps + 1, dtype=jnp.float32)
        else:
            ts = jnp.asarray(timesteps, jnp.float32)
        return WuerstchenState(ts, len(ts) - 1)

    def scale_model_input(self, state, sample, i):
        return sample

    def step(self, state: WuerstchenState, model_output, i, sample, key=None):
        t = state.timesteps[i]
        prev_t = state.timesteps[i + 1]
        acp = self._alpha_cumprod(t)
        acp_prev = self._alpha_cumprod(prev_t)
        alpha = acp / acp_prev
        mu = (sample - (1 - alpha) * model_output * jax.lax.rsqrt(1 - acp)) \
            * jax.lax.rsqrt(alpha)
        if key is not None:
            noise = jax.random.normal(key, sample.shape, jnp.float32).astype(sample.dtype)
            std = jnp.sqrt((1 - alpha) * (1 - acp_prev) / (1 - acp))
            mu = mu + std * noise * (prev_t != 0).astype(sample.dtype)
        return mu.astype(sample.dtype), state

    def add_noise(self, original_samples, noise, timesteps):
        acp = self._alpha_cumprod(timesteps.astype(jnp.float32))
        while acp.ndim < original_samples.ndim:
            acp = acp[..., None]
        acp = acp.astype(original_samples.dtype)
        return jnp.sqrt(acp) * original_samples + jnp.sqrt(1 - acp) * noise
