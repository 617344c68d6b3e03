"""UniPC multistep scheduler, order-2 predictor-corrector in data-prediction
form (reference ppdiffusers/schedulers/scheduling_unipc_multistep.py).
State-carried history like DPM-Solver so the loop jits."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, spaced_timesteps


@dataclasses.dataclass
class UniPCConfig(SchedulerConfig):
    model_type = "unipc"
    solver_order: int = 2
    timestep_spacing: str = "linspace"
    lower_order_final: bool = True


class UniPCState(NamedTuple):
    timesteps: jnp.ndarray
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    lambda_t: jnp.ndarray
    x0_prev: jnp.ndarray
    sample_prev: jnp.ndarray
    step_count: jnp.ndarray
    num_inference_steps: int


class UniPCMultistepScheduler(Scheduler):
    config_class = UniPCConfig

    def set_timesteps(self, num_inference_steps: int, sample_shape: Tuple[int, ...] = (1,),
                      dtype=jnp.float32) -> UniPCState:
        acp = np.asarray(self.alphas_cumprod)
        ts = spaced_timesteps(self.config, num_inference_steps)
        a = np.sqrt(acp[ts])
        s = np.sqrt(1.0 - acp[ts])
        alpha_t = np.concatenate([a, [1.0]]).astype(np.float32)
        sigma_t = np.concatenate([s, [1e-9]]).astype(np.float32)
        lambda_t = np.log(alpha_t) - np.log(np.maximum(sigma_t, 1e-10))
        return UniPCState(jnp.asarray(ts, jnp.int32), jnp.asarray(alpha_t),
                          jnp.asarray(sigma_t), jnp.asarray(lambda_t),
                          jnp.zeros(sample_shape, dtype), jnp.zeros(sample_shape, dtype),
                          jnp.zeros((), jnp.int32), num_inference_steps)

    def _to_x0(self, model_output, sample, alpha, sigma):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return (sample - sigma * model_output) / alpha
        if pt == "v_prediction":
            return alpha * sample - sigma * model_output
        return model_output

    def step(self, state: UniPCState, model_output, i, sample, key=None):
        f32 = jnp.float32
        s32 = sample.astype(f32)
        alpha, sigma = state.alpha_t[i], state.sigma_t[i]
        alpha_n, sigma_n = state.alpha_t[i + 1], state.sigma_t[i + 1]
        lam, lam_n = state.lambda_t[i], state.lambda_t[i + 1]
        x0 = self._to_x0(model_output.astype(f32), s32, alpha, sigma)

        h = lam_n - lam
        # first-order (DPM++ 1S)
        first = (sigma_n / sigma) * s32 - alpha_n * jnp.expm1(-h) * x0
        # UniP order-2 using previous x0 (same correction family as DPM++ 2M)
        lam_prev = state.lambda_t[jnp.maximum(i - 1, 0)]
        r = (lam - lam_prev) / jnp.maximum(h, 1e-12)
        d1 = (x0 - state.x0_prev.astype(f32)) / jnp.maximum(r, 1e-8)
        # B(h) = expm1(-h) variant with 0.5 coefficient (B2 form)
        second = first - 0.5 * alpha_n * jnp.expm1(-h) * d1

        use_first = (state.step_count == 0)
        if self.config.lower_order_final:
            use_first = use_first | (i == state.num_inference_steps - 1)
        prev = jnp.where(use_first | (self.config.solver_order < 2), first, second)
        return prev.astype(sample.dtype), state._replace(
            x0_prev=x0.astype(state.x0_prev.dtype),
            sample_prev=s32.astype(state.sample_prev.dtype),
            step_count=state.step_count + 1)
