"""DPM-Solver++ multistep (reference
ppdiffusers/schedulers/scheduling_dpmsolver_multistep.py, data-prediction
algorithm). State carries the model-output history so the whole loop jits."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, spaced_timesteps


@dataclasses.dataclass
class DPMSolverConfig(SchedulerConfig):
    model_type = "dpmsolver++"
    solver_order: int = 2
    algorithm_type: str = "dpmsolver++"
    use_karras_sigmas: bool = False
    lower_order_final: bool = True
    timestep_spacing: str = "linspace"


class DPMSolverState(NamedTuple):
    timesteps: jnp.ndarray   # (N,)
    alpha_t: jnp.ndarray     # (N+1,)
    sigma_t: jnp.ndarray     # (N+1,)
    lambda_t: jnp.ndarray    # (N+1,)
    x0_prev: jnp.ndarray     # (sample shape) previous x0 prediction
    step_count: jnp.ndarray  # () int32
    num_inference_steps: int


class DPMSolverMultistepScheduler(Scheduler):
    config_class = DPMSolverConfig
    order = 1  # one model eval per step (multistep)

    def set_timesteps(self, num_inference_steps: int, sample_shape: Tuple[int, ...] = (1,),
                      dtype=jnp.float32) -> DPMSolverState:
        acp = np.asarray(self.alphas_cumprod)
        ts = spaced_timesteps(self.config, num_inference_steps)
        a = np.sqrt(acp[ts])
        s = np.sqrt(1.0 - acp[ts])
        # terminal boundary: alpha=1, sigma=0
        alpha_t = np.concatenate([a, [1.0]]).astype(np.float32)
        sigma_t = np.concatenate([s, [1e-9]]).astype(np.float32)
        lambda_t = np.log(alpha_t) - np.log(np.maximum(sigma_t, 1e-10))
        return DPMSolverState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_t=jnp.asarray(alpha_t),
            sigma_t=jnp.asarray(sigma_t),
            lambda_t=jnp.asarray(lambda_t),
            x0_prev=jnp.zeros(sample_shape, dtype),
            step_count=jnp.zeros((), jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    def _to_x0(self, model_output, sample, alpha, sigma):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return (sample - sigma * model_output) / alpha
        if pt == "v_prediction":
            return alpha * sample - sigma * model_output
        return model_output

    def step(self, state: DPMSolverState, model_output, i, sample, key=None):
        f32 = jnp.float32
        sample32 = sample.astype(f32)
        alpha, sigma = state.alpha_t[i], state.sigma_t[i]
        alpha_next, sigma_next = state.alpha_t[i + 1], state.sigma_t[i + 1]
        lam, lam_next = state.lambda_t[i], state.lambda_t[i + 1]
        x0 = self._to_x0(model_output.astype(f32), sample32, alpha, sigma)

        h = lam_next - lam
        # first-order (DPM++ 1S / DDIM-like) update
        first = (sigma_next / sigma) * sample32 - alpha_next * jnp.expm1(-h) * x0

        # second-order multistep correction using previous x0
        lam_prev = state.lambda_t[jnp.maximum(i - 1, 0)]
        h_prev = lam - lam_prev
        r = h_prev / h
        d1 = (x0 - state.x0_prev.astype(f32)) / jnp.maximum(r, 1e-8)
        second = first - 0.5 * alpha_next * jnp.expm1(-h) * d1

        use_first = state.step_count == 0
        if self.config.lower_order_final:
            use_first = use_first | (i == state.num_inference_steps - 1)
        prev = jnp.where(use_first | (self.config.solver_order < 2), first, second)
        new_state = state._replace(x0_prev=x0.astype(state.x0_prev.dtype),
                                   step_count=state.step_count + 1)
        return prev.astype(sample.dtype), new_state
