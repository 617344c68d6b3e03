"""Euler discrete + Euler ancestral schedulers (reference
ppdiffusers/schedulers/scheduling_euler_discrete.py,
scheduling_euler_ancestral_discrete.py), with optional Karras sigmas."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, make_alphas_cumprod, spaced_timesteps


@dataclasses.dataclass
class EulerConfig(SchedulerConfig):
    model_type = "euler"
    use_karras_sigmas: bool = False
    interpolation_type: str = "linear"
    timestep_spacing: str = "linspace"


class EulerState(NamedTuple):
    timesteps: jnp.ndarray  # (N,) float32 (training-timestep units)
    sigmas: jnp.ndarray     # (N+1,) float32, last is 0
    num_inference_steps: int


def _karras_sigmas(sigma_min, sigma_max, n, rho=7.0):
    ramp = np.linspace(0, 1, n)
    min_inv, max_inv = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    return (max_inv + ramp * (min_inv - max_inv)) ** rho


class EulerDiscreteScheduler(Scheduler):
    config_class = EulerConfig

    def _full_sigmas(self):
        acp = np.asarray(self.alphas_cumprod)
        return ((1.0 - acp) / acp) ** 0.5

    @property
    def init_noise_sigma(self) -> float:
        s = self._full_sigmas()
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return float(s.max())
        return float((s.max() ** 2 + 1) ** 0.5)

    def set_timesteps(self, num_inference_steps: int) -> EulerState:
        full = self._full_sigmas()
        ts = spaced_timesteps(self.config, num_inference_steps).astype(np.float64)
        sigmas = np.interp(ts, np.arange(len(full)), full)
        if self.config.use_karras_sigmas:
            sigmas = _karras_sigmas(float(full[0]), float(full[-1]), num_inference_steps)
            log_full = np.log(full)
            ts = np.asarray([np.interp(np.log(s), log_full, np.arange(len(full))) for s in sigmas])
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return EulerState(jnp.asarray(ts, jnp.float32), jnp.asarray(sigmas),
                          num_inference_steps)

    def scale_model_input(self, state: EulerState, sample, i):
        sigma = state.sigmas[i]
        return sample / jnp.sqrt(sigma ** 2 + 1.0).astype(sample.dtype)

    def _x0(self, model_output, sample, sigma):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return sample - sigma * model_output
        if pt == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + sample / (sigma ** 2 + 1)
        return model_output

    def step(self, state: EulerState, model_output, i, sample, key=None):
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        x0 = self._x0(model_output.astype(jnp.float32), sample.astype(jnp.float32), sigma)
        derivative = (sample.astype(jnp.float32) - x0) / sigma
        prev = sample.astype(jnp.float32) + (sigma_next - sigma) * derivative
        return prev.astype(sample.dtype), state


class EulerAncestralDiscreteScheduler(EulerDiscreteScheduler):
    config_class = EulerConfig

    def step(self, state: EulerState, model_output, i, sample, key=None):
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        x0 = self._x0(model_output.astype(jnp.float32), sample.astype(jnp.float32), sigma)
        sigma_up = jnp.sqrt(jnp.maximum(
            sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / jnp.maximum(sigma ** 2, 1e-12), 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - sigma_up ** 2, 0.0))
        derivative = (sample.astype(jnp.float32) - x0) / sigma
        prev = sample.astype(jnp.float32) + (sigma_down - sigma) * derivative
        if key is not None:
            prev = prev + sigma_up * jax.random.normal(key, sample.shape)
        return prev.astype(sample.dtype), state
