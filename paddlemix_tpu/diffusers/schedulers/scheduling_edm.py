"""EDM (Karras et al. 2022) schedulers: Euler and DPM-Solver++ multistep.

Rebuild of the reference's scheduling_edm_euler.py /
scheduling_edm_dpmsolver_multistep.py. EDM models take c_in-scaled inputs and
c_noise = 0.25*log(sigma) timesteps; the model output is combined with the
sample through (c_skip, c_out) preconditioning to produce the denoised x0.
State pytrees + pure steps, fori_loop-native like the rest of the zoo.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig


@dataclasses.dataclass
class EDMConfig(SchedulerConfig):
    model_type = "edm"
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    num_train_timesteps: int = 1000
    # EDM-DPM only
    solver_order: int = 2
    lower_order_final: bool = True


class EDMState(NamedTuple):
    timesteps: jnp.ndarray  # (N,) c_noise = 0.25*log(sigma)
    sigmas: jnp.ndarray     # (N+1,), last 0
    x0_prev: jnp.ndarray    # (EDM-DPM multistep history; zeros for Euler)
    step_count: jnp.ndarray
    num_inference_steps: int


class EDMEulerScheduler(Scheduler):
    config_class = EDMConfig
    order = 1

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        self.alphas_cumprod = None  # EDM is sigma-native (VE-style)

    @property
    def init_noise_sigma(self) -> float:
        return (self.config.sigma_max ** 2 + 1) ** 0.5

    def _compute_sigmas(self, n):
        cfg = self.config
        ramp = np.linspace(0, 1, n)
        min_inv = cfg.sigma_min ** (1 / cfg.rho)
        max_inv = cfg.sigma_max ** (1 / cfg.rho)
        return (max_inv + ramp * (min_inv - max_inv)) ** cfg.rho

    def set_timesteps(self, num_inference_steps: int,
                      sample_shape: Tuple[int, ...] = ()) -> EDMState:
        sigmas = self._compute_sigmas(num_inference_steps)
        ts = 0.25 * np.log(sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return EDMState(jnp.asarray(ts, jnp.float32), jnp.asarray(sigmas),
                        jnp.zeros(sample_shape, jnp.float32),
                        jnp.zeros((), jnp.int32), num_inference_steps)

    def scale_model_input(self, state: EDMState, sample, i):
        sigma = state.sigmas[i]
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + self.config.sigma_data ** 2)
        return (sample * c_in).astype(sample.dtype)

    def precondition_outputs(self, sample, model_output, sigma):
        sd = self.config.sigma_data
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        if self.config.prediction_type == "epsilon":
            c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        elif self.config.prediction_type == "v_prediction":
            c_out = -sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        else:
            raise ValueError(self.config.prediction_type)
        return c_skip * sample + c_out * model_output

    def add_noise(self, original_samples, noise, timesteps):
        # timesteps here are indices into the inference sigma grid (EDM is
        # sigma-native); pipelines pass sigma directly via state
        raise NotImplementedError("use x0 + sigma * noise with state.sigmas")

    def step(self, state: EDMState, model_output, i, sample, key=None):
        x = sample.astype(jnp.float32)
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        denoised = self.precondition_outputs(x, model_output.astype(jnp.float32), sigma)
        derivative = (x - denoised) / sigma
        prev = x + (sigma_next - sigma) * derivative
        return prev.astype(sample.dtype), state


class EDMDPMSolverMultistepScheduler(EDMEulerScheduler):
    """DPM-Solver++(2M) on the EDM sigma schedule (reference
    scheduling_edm_dpmsolver_multistep.py). VE parameterization: alpha_t = 1,
    lambda = -log(sigma)."""

    config_class = EDMConfig
    order = 1

    def step(self, state: EDMState, model_output, i, sample, key=None):
        f32 = jnp.float32
        x = sample.astype(f32)
        sigma = state.sigmas[i]
        sigma_next = jnp.maximum(state.sigmas[i + 1], 1e-10)
        sigma_prev = state.sigmas[jnp.maximum(i - 1, 0)]
        x0 = self.precondition_outputs(x, model_output.astype(f32), sigma)

        # reference _sigma_to_alpha_sigma_t: alpha_t = 1 (inputs are
        # c_in-prescaled), sigma stays raw; lambda = -log(sigma)
        lam = -jnp.log(sigma)
        lam_next = -jnp.log(sigma_next)
        lam_prev = -jnp.log(jnp.maximum(sigma_prev, 1e-10))

        h = lam_next - lam
        first = (sigma_next / sigma) * x - jnp.expm1(-h) * x0
        h_prev = lam - lam_prev
        r = h_prev / jnp.maximum(h, 1e-10)
        d1 = (x0 - state.x0_prev.astype(f32)) / jnp.maximum(r, 1e-8)
        second = first - 0.5 * jnp.expm1(-h) * d1

        use_first = state.step_count == 0
        if self.config.lower_order_final:
            use_first = use_first | (i == state.num_inference_steps - 1)
        prev = jnp.where(use_first | (self.config.solver_order < 2), first, second)
        new_state = state._replace(x0_prev=x0.astype(state.x0_prev.dtype),
                                   step_count=state.step_count + 1)
        return prev.astype(sample.dtype), new_state
