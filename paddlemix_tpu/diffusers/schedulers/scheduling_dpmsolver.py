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


@dataclasses.dataclass
class DPMSolverSinglestepConfig(DPMSolverConfig):
    model_type = "dpmsolver_singlestep"


class DPMSolverSinglestepState(NamedTuple):
    timesteps: jnp.ndarray
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    lambda_t: jnp.ndarray
    orders: jnp.ndarray          # (N,) int32 per-step effective order
    segment_sample: jnp.ndarray  # sample at the start of the current 2-step segment
    x0_prev: jnp.ndarray         # x0 at the segment start
    num_inference_steps: int


class DPMSolverSinglestepScheduler(DPMSolverMultistepScheduler):
    """DPM-Solver++ singlestep (reference scheduling_dpmsolver_singlestep.py,
    solver_order<=2): steps alternate order [1,2,1,2,...]; the order-2 update
    jumps from the segment start (t_{i-1}) to t_{i+1} using both cached model
    x0s, matching the reference's get_order_list pairing."""

    config_class = DPMSolverSinglestepConfig

    def set_timesteps(self, num_inference_steps: int, sample_shape=(1,),
                      dtype=jnp.float32) -> DPMSolverSinglestepState:
        base = super().set_timesteps(num_inference_steps, sample_shape, dtype)
        n = num_inference_steps
        if self.config.solver_order >= 2:
            orders = ([1, 2] * (n // 2)) + ([1] if n % 2 else [])
        else:
            orders = [1] * n
        return DPMSolverSinglestepState(
            base.timesteps, base.alpha_t, base.sigma_t, base.lambda_t,
            jnp.asarray(orders, jnp.int32),
            jnp.zeros(sample_shape, dtype), jnp.zeros(sample_shape, dtype),
            num_inference_steps)

    def step(self, state: DPMSolverSinglestepState, model_output, i, sample, key=None):
        f32 = jnp.float32
        x = sample.astype(f32)
        alpha, sigma = state.alpha_t[i], state.sigma_t[i]
        alpha_next, sigma_next = state.alpha_t[i + 1], state.sigma_t[i + 1]
        lam_next = state.lambda_t[i + 1]
        x0 = self._to_x0(model_output.astype(f32), x, alpha, sigma)

        # order 1: t_i -> t_{i+1}
        h1 = lam_next - state.lambda_t[i]
        first = (sigma_next / sigma) * x - alpha_next * jnp.expm1(-h1) * x0

        # order 2: segment start t_{i-1} -> t_{i+1}
        im1 = jnp.maximum(i - 1, 0)
        lam_s1 = state.lambda_t[im1]
        sigma_s1 = state.sigma_t[im1]
        h = lam_next - lam_s1
        h0 = state.lambda_t[i] - lam_s1
        r0 = h0 / jnp.maximum(h, 1e-10)
        m1 = state.x0_prev.astype(f32)
        d0 = m1
        d1 = (x0 - m1) / jnp.maximum(r0, 1e-8)
        seg = state.segment_sample.astype(f32)
        second = (sigma_next / sigma_s1) * seg \
            - alpha_next * jnp.expm1(-h) * d0 \
            - 0.5 * alpha_next * jnp.expm1(-h) * d1

        order = state.orders[i]
        prev = jnp.where(order == 1, first, second)
        # on an order-1 step, this step starts a segment
        new_seg = jnp.where(order == 1, x, state.segment_sample.astype(f32))
        new_state = state._replace(
            segment_sample=new_seg.astype(state.segment_sample.dtype),
            x0_prev=x0.astype(state.x0_prev.dtype))
        return prev.astype(sample.dtype), new_state


@dataclasses.dataclass
class DPMSolverUniDiffuserConfig(DPMSolverConfig):
    model_type = "dpmsolver_unidiffuser"
    algorithm_type: str = "dpmsolver"  # noise-prediction DPM-Solver


class DPMSolverUniDiffuserScheduler(DPMSolverMultistepScheduler):
    """UniDiffuser's DPM-Solver (reference scheduling_dpmsolver_unidiffuser.py):
    the noise-prediction ("dpmsolver") algorithm with uniform time skips —
    multistep 2nd order over eps instead of x0."""

    config_class = DPMSolverUniDiffuserConfig

    def step(self, state: DPMSolverState, model_output, i, sample, key=None):
        f32 = jnp.float32
        x = sample.astype(f32)
        alpha, sigma = state.alpha_t[i], state.sigma_t[i]
        alpha_next, sigma_next = state.alpha_t[i + 1], state.sigma_t[i + 1]
        lam, lam_next = state.lambda_t[i], state.lambda_t[i + 1]
        # convert model output to eps
        x0 = self._to_x0(model_output.astype(f32), x, alpha, sigma)
        eps = (x - alpha * x0) / jnp.maximum(sigma, 1e-10)

        h = lam_next - lam
        first = (alpha_next / alpha) * x - sigma_next * jnp.expm1(h) * eps

        lam_prev = state.lambda_t[jnp.maximum(i - 1, 0)]
        h_prev = lam - lam_prev
        r = h_prev / jnp.maximum(h, 1e-10)
        # x0_prev slot stores the previous eps for this variant
        d1 = (eps - state.x0_prev.astype(f32)) / jnp.maximum(r, 1e-8)
        second = first - 0.5 * sigma_next * jnp.expm1(h) * d1

        use_first = state.step_count == 0
        if self.config.lower_order_final:
            use_first = use_first | (i == state.num_inference_steps - 1)
        prev = jnp.where(use_first | (self.config.solver_order < 2), first, second)
        new_state = state._replace(x0_prev=eps.astype(state.x0_prev.dtype),
                                   step_count=state.step_count + 1)
        return prev.astype(sample.dtype), new_state
