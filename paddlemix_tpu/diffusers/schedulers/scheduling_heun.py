"""Heun (2nd-order) discrete scheduler (reference
ppdiffusers/schedulers/scheduling_heun_discrete.py). Two model evals per step:
this implementation keeps one eval per ``step`` call by carrying the
first-stage derivative in state (matching the reference's stateful design) so
the jitted fori_loop shape is unchanged."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler
from .scheduling_euler import EulerConfig, _karras_sigmas


@dataclasses.dataclass
class HeunConfig(EulerConfig):
    model_type = "heun"


class HeunState(NamedTuple):
    timesteps: jnp.ndarray  # (2N-1,) — interleaved for the two stages
    sigmas: jnp.ndarray     # (2N,)
    prev_derivative: jnp.ndarray
    sample: jnp.ndarray
    stage: jnp.ndarray      # () int32: 0 = first eval, 1 = second eval
    num_inference_steps: int


class HeunDiscreteScheduler(Scheduler):
    config_class = HeunConfig
    order = 2

    def _full_sigmas(self):
        acp = np.asarray(self.alphas_cumprod)
        return ((1.0 - acp) / acp) ** 0.5

    @property
    def init_noise_sigma(self) -> float:
        return float(self._full_sigmas().max())

    def set_timesteps(self, num_inference_steps: int, sample_shape=(1,),
                      dtype=jnp.float32) -> HeunState:
        full = self._full_sigmas()
        ts = np.linspace(0, self.config.num_train_timesteps - 1,
                         num_inference_steps)[::-1].astype(np.float64)
        sigmas = np.interp(ts, np.arange(len(full)), full)
        if self.config.use_karras_sigmas:
            sigmas = _karras_sigmas(float(full[0]), float(full[-1]), num_inference_steps)
        # interleave: each solver step evaluates at sigma_i then sigma_{i+1}
        inter_ts = np.repeat(ts, 2)[1:]
        inter_sigmas = np.concatenate([[sigmas[0]],
                                       np.repeat(sigmas[1:], 2), [0.0]]).astype(np.float32)
        return HeunState(
            timesteps=jnp.asarray(inter_ts, jnp.float32),
            sigmas=jnp.asarray(inter_sigmas),
            prev_derivative=jnp.zeros(sample_shape, dtype),
            sample=jnp.zeros(sample_shape, dtype),
            stage=jnp.zeros((), jnp.int32),
            num_inference_steps=2 * num_inference_steps - 1,
        )

    def scale_model_input(self, state: HeunState, sample, i):
        sigma = state.sigmas[i]
        return sample / jnp.sqrt(sigma ** 2 + 1.0).astype(sample.dtype)

    def step(self, state: HeunState, model_output, i, sample, key=None):
        f32 = jnp.float32
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        s32 = sample.astype(f32)
        pt = self.config.prediction_type
        if pt == "epsilon":
            x0 = s32 - sigma * model_output.astype(f32)
        elif pt == "v_prediction":
            x0 = model_output.astype(f32) * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + s32 / (sigma ** 2 + 1)
        else:
            x0 = model_output.astype(f32)
        derivative = (s32 - x0) / jnp.maximum(sigma, 1e-12)

        is_first = state.stage == 0
        # first stage: euler step to sigma_next, remember sample+derivative
        first_out = s32 + (sigma_next - sigma) * derivative
        # second stage: average derivatives, step the SAVED sample over the
        # full interval [sigmas[i-1], sigma_next]
        avg = 0.5 * (state.prev_derivative.astype(f32) + derivative)
        second_out = state.sample.astype(f32) + (sigma_next - state.sigmas[i - 1]) * avg

        prev = jnp.where(is_first, first_out, second_out)
        # last sigma_next == 0 with stage flip bookkeeping
        new_state = state._replace(
            prev_derivative=jnp.where(is_first, derivative,
                                      state.prev_derivative.astype(f32)).astype(state.prev_derivative.dtype),
            sample=jnp.where(is_first, s32, state.sample.astype(f32)).astype(state.sample.dtype),
            stage=1 - state.stage,
        )
        return prev.astype(sample.dtype), new_state
