"""FlowMatch Euler scheduler for SD3 (reference
ppdiffusers/schedulers/scheduling_flow_match_euler_discrete.py)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig


@dataclasses.dataclass
class FlowMatchConfig(SchedulerConfig):
    model_type = "flow_match_euler"
    shift: float = 3.0
    use_dynamic_shifting: bool = False


class FlowMatchState(NamedTuple):
    timesteps: jnp.ndarray  # (N,) float32 = sigma * num_train_timesteps
    sigmas: jnp.ndarray     # (N+1,)
    num_inference_steps: int


class FlowMatchEulerDiscreteScheduler(Scheduler):
    config_class = FlowMatchConfig

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        self.config = config
        self.alphas_cumprod = None  # flow matching has no VP alphas

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def set_timesteps(self, num_inference_steps: int, mu: float = None) -> FlowMatchState:
        n = self.config.num_train_timesteps
        sigmas = np.linspace(1.0, 1.0 / n, num_inference_steps)
        if self.config.use_dynamic_shifting and mu is not None:
            sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
        else:
            shift = self.config.shift
            sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
        timesteps = sigmas * n
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return FlowMatchState(jnp.asarray(timesteps, jnp.float32), jnp.asarray(sigmas),
                              num_inference_steps)

    def add_noise(self, original_samples, noise, timesteps):
        """Flow-matching interpolation x_t = (1-sigma) x0 + sigma * noise."""
        sigma = (timesteps.astype(jnp.float32) / self.config.num_train_timesteps)
        while sigma.ndim < original_samples.ndim:
            sigma = sigma[..., None]
        return (1.0 - sigma) * original_samples + sigma * noise

    # alias used by SD3 training (reference sd3 trainer)
    scale_noise = add_noise

    def step(self, state: FlowMatchState, model_output, i, sample, key=None):
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        prev = sample.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(jnp.float32)
        return prev.astype(sample.dtype), state
