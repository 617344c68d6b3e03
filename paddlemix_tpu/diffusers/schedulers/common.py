"""Scheduler substrate: beta schedules, timestep spacing, prediction types.

Rebuild of the shared machinery behind the reference's 33 schedulers
(ppdiffusers/ppdiffusers/schedulers/scheduling_utils.py:62-195 SchedulerMixin,
scheduling_ddpm.py betas_for_alpha_bar, etc.) — redesigned as pure functions
over explicit state pytrees so a full denoise loop jits into one
lax.fori_loop (the reference steps schedulers from python per iteration).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import BaseConfig


@dataclasses.dataclass
class SchedulerConfig(BaseConfig):
    config_name = "scheduler_config.json"
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"  # linear | scaled_linear | squaredcos_cap_v2
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample
    timestep_spacing: str = "leading"  # leading | trailing | linspace
    steps_offset: int = 0
    trained_betas: Optional[Tuple[float, ...]] = None


def make_betas(cfg: SchedulerConfig) -> jnp.ndarray:
    if cfg.trained_betas is not None:
        return jnp.asarray(cfg.trained_betas, jnp.float32)
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return jnp.linspace(cfg.beta_start, cfg.beta_end, n, dtype=jnp.float32)
    if cfg.beta_schedule == "scaled_linear":
        return jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n, dtype=jnp.float32) ** 2
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999) for i in range(n)]
        return jnp.asarray(betas, jnp.float32)
    raise ValueError(f"unknown beta_schedule {cfg.beta_schedule!r}")


def make_alphas_cumprod(cfg: SchedulerConfig) -> jnp.ndarray:
    return jnp.cumprod(1.0 - make_betas(cfg), axis=0)


def spaced_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending int timesteps per the reference spacing conventions."""
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, n - 1, num_inference_steps).round()[::-1].astype(np.int64)
    elif cfg.timestep_spacing == "leading":
        ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * ratio).round()[::-1].astype(np.int64)
        ts += cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        ratio = n / num_inference_steps
        ts = np.round(np.arange(n, 0, -ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing {cfg.timestep_spacing!r}")
    return ts


def predicted_x0(model_output, sample, alpha_prod_t, prediction_type: str):
    """Convert a model output into the x0 estimate (shared by all solvers)."""
    beta_prod_t = 1.0 - alpha_prod_t
    if prediction_type == "epsilon":
        return (sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
    if prediction_type == "v_prediction":
        return alpha_prod_t ** 0.5 * sample - beta_prod_t ** 0.5 * model_output
    if prediction_type == "sample":
        return model_output
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def predicted_eps(model_output, sample, alpha_prod_t, prediction_type: str):
    beta_prod_t = 1.0 - alpha_prod_t
    if prediction_type == "epsilon":
        return model_output
    if prediction_type == "v_prediction":
        return alpha_prod_t ** 0.5 * model_output + beta_prod_t ** 0.5 * sample
    if prediction_type == "sample":
        return (sample - alpha_prod_t ** 0.5 * model_output) / beta_prod_t ** 0.5
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def add_noise_common(alphas_cumprod, original_samples, noise, timesteps):
    """Forward diffusion q(x_t | x_0) (training: reference add_noise)."""
    a = alphas_cumprod[timesteps].astype(original_samples.dtype)
    while a.ndim < original_samples.ndim:
        a = a[..., None]
    return a ** 0.5 * original_samples + (1.0 - a) ** 0.5 * noise


def velocity_common(alphas_cumprod, sample, noise, timesteps):
    """v-prediction target (reference get_velocity)."""
    a = alphas_cumprod[timesteps].astype(sample.dtype)
    while a.ndim < sample.ndim:
        a = a[..., None]
    return a ** 0.5 * noise - (1.0 - a) ** 0.5 * sample


class Scheduler:
    """Base: config io + add_noise. Subclasses define set_timesteps/step.

    State is an explicit NamedTuple/pytree; ``step(state, model_output, i,
    sample, key=None)`` is pure and jit/scan-compatible."""

    config_class = SchedulerConfig
    order = 1

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        self.alphas_cumprod = make_alphas_cumprod(config)

    @classmethod
    def from_pretrained(cls, path, subfolder=None, **overrides):
        return cls(cls.config_class.from_pretrained(path, subfolder=subfolder, **overrides))

    @classmethod
    def from_config(cls, config_dict: dict, **overrides):
        return cls(cls.config_class.from_dict(dict(config_dict), **overrides))

    def save_pretrained(self, path):
        self.config.save_pretrained(path)

    def add_noise(self, original_samples, noise, timesteps):
        return add_noise_common(self.alphas_cumprod, original_samples, noise, timesteps)

    def get_velocity(self, sample, noise, timesteps):
        return velocity_common(self.alphas_cumprod, sample, noise, timesteps)

    def scale_model_input(self, state, sample, i):
        return sample

    @property
    def init_noise_sigma(self) -> float:
        return 1.0
