"""Additional solvers: DEIS multistep, consistency models, DPM-Solver SDE.

Reference: ppdiffusers/schedulers/scheduling_deis_multistep.py,
scheduling_consistency_models.py, scheduling_dpmsolver_sde.py — same
pure-state design as the rest of the zoo."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, spaced_timesteps


# ------------------------------------------------------------------ DEIS
@dataclasses.dataclass
class DEISConfig(SchedulerConfig):
    model_type = "deis"
    solver_order: int = 2
    timestep_spacing: str = "linspace"
    lower_order_final: bool = True


class DEISState(NamedTuple):
    timesteps: jnp.ndarray
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    log_rho: jnp.ndarray     # log(sigma/alpha)
    eps_prev: jnp.ndarray
    step_count: jnp.ndarray
    num_inference_steps: int


class DEISMultistepScheduler(Scheduler):
    """DEIS (exponential-integrator, epsilon-form, order-2 AB)."""

    config_class = DEISConfig

    def set_timesteps(self, num_inference_steps: int, sample_shape: Tuple[int, ...] = (1,),
                      dtype=jnp.float32) -> DEISState:
        acp = np.asarray(self.alphas_cumprod)
        ts = spaced_timesteps(self.config, num_inference_steps)
        a = np.sqrt(acp[ts])
        s = np.sqrt(1.0 - acp[ts])
        alpha_t = np.concatenate([a, [1.0]]).astype(np.float32)
        sigma_t = np.concatenate([s, [1e-6]]).astype(np.float32)
        log_rho = np.log(sigma_t) - np.log(alpha_t)
        return DEISState(jnp.asarray(ts, jnp.int32), jnp.asarray(alpha_t),
                         jnp.asarray(sigma_t), jnp.asarray(log_rho),
                         jnp.zeros(sample_shape, dtype), jnp.zeros((), jnp.int32),
                         num_inference_steps)

    def step(self, state: DEISState, model_output, i, sample, key=None):
        f32 = jnp.float32
        s32 = sample.astype(f32)
        cfg = self.config
        alpha, sigma = state.alpha_t[i], state.sigma_t[i]
        alpha_n, sigma_n = state.alpha_t[i + 1], state.sigma_t[i + 1]
        # convert to epsilon
        if cfg.prediction_type == "epsilon":
            eps = model_output.astype(f32)
        elif cfg.prediction_type == "v_prediction":
            eps = alpha * model_output.astype(f32) + sigma * s32
        else:
            eps = (s32 - alpha * model_output.astype(f32)) / sigma
        # DEIS integrates in rho-time (rho = sigma/alpha); epsilon-form:
        #   x_{n+1} = (alpha_{n+1}/alpha_n) x_n + alpha_{n+1} (rho_{n+1}-rho_n) eps
        # with an Adams–Bashforth-2 extrapolation of eps for order 2.
        rho = jnp.exp(state.log_rho[i])
        rho_n = jnp.exp(state.log_rho[i + 1])
        rho_prev = jnp.exp(state.log_rho[jnp.maximum(i - 1, 0)])
        rho_d = rho_n - rho           # negative: rho shrinks while denoising
        rho_prev_d = rho - rho_prev
        first = (alpha_n / alpha) * s32 + alpha_n * rho_d * eps
        r = rho_d / jnp.where(rho_prev_d == 0, 1e-12, rho_prev_d)
        eps_ab = eps + 0.5 * r * (eps - state.eps_prev.astype(f32))
        second = (alpha_n / alpha) * s32 + alpha_n * rho_d * eps_ab
        use_first = state.step_count == 0
        if self.config.lower_order_final:
            use_first = use_first | (i == state.num_inference_steps - 1)
        prev = jnp.where(use_first | (cfg.solver_order < 2), first, second)
        return prev.astype(sample.dtype), state._replace(
            eps_prev=eps.astype(state.eps_prev.dtype), step_count=state.step_count + 1)


# ------------------------------------------------------------------ consistency
@dataclasses.dataclass
class ConsistencyConfig(SchedulerConfig):
    model_type = "consistency"
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0


class ConsistencyState(NamedTuple):
    timesteps: jnp.ndarray  # sigma values, descending
    num_inference_steps: int


class CMStochasticIterativeScheduler(Scheduler):
    """Consistency models: one-shot denoise at each sigma, renoise between."""

    config_class = ConsistencyConfig

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        self.config = config
        self.alphas_cumprod = None

    @property
    def init_noise_sigma(self) -> float:
        return self.config.sigma_max

    def set_timesteps(self, num_inference_steps: int) -> ConsistencyState:
        cfg = self.config
        ramp = np.linspace(0, 1, num_inference_steps)
        mn, mx, rho = cfg.sigma_min ** (1 / cfg.rho), cfg.sigma_max ** (1 / cfg.rho), cfg.rho
        sigmas = (mx + ramp * (mn - mx)) ** rho
        return ConsistencyState(jnp.asarray(sigmas, jnp.float32), num_inference_steps)

    def scalings(self, sigma):
        cfg = self.config
        c_skip = cfg.sigma_data ** 2 / ((sigma - cfg.sigma_min) ** 2 + cfg.sigma_data ** 2)
        c_out = (sigma - cfg.sigma_min) * cfg.sigma_data / jnp.sqrt(
            sigma ** 2 + cfg.sigma_data ** 2)
        return c_skip, c_out

    def scale_model_input(self, state, sample, i):
        sigma = state.timesteps[i]
        return sample / jnp.sqrt(sigma ** 2 + self.config.sigma_data ** 2).astype(sample.dtype)

    def step(self, state: ConsistencyState, model_output, i, sample, key=None):
        sigma = state.timesteps[i]
        c_skip, c_out = self.scalings(sigma)
        denoised = c_out * model_output.astype(jnp.float32) + c_skip * sample.astype(jnp.float32)
        nxt = state.timesteps[jnp.minimum(i + 1, state.num_inference_steps - 1)]
        is_last = i == state.num_inference_steps - 1
        if key is not None:
            z = jax.random.normal(key, sample.shape)
            renoise = denoised + jnp.sqrt(jnp.maximum(
                nxt ** 2 - self.config.sigma_min ** 2, 0.0)) * z
        else:
            renoise = denoised
        prev = jnp.where(is_last, denoised, renoise)
        return prev.astype(sample.dtype), state


# ------------------------------------------------------------------ DPM-SDE
@dataclasses.dataclass
class DPMSDEConfig(SchedulerConfig):
    model_type = "dpmsolver_sde"
    timestep_spacing: str = "linspace"


class DPMSDEState(NamedTuple):
    timesteps: jnp.ndarray
    sigmas: jnp.ndarray
    num_inference_steps: int


class DPMSolverSDEScheduler(Scheduler):
    """SDE variant: ancestral-style stochastic step in sigma space."""

    config_class = DPMSDEConfig

    def _full_sigmas(self):
        acp = np.asarray(self.alphas_cumprod)
        return ((1.0 - acp) / acp) ** 0.5

    @property
    def init_noise_sigma(self) -> float:
        return float(self._full_sigmas().max())

    def set_timesteps(self, num_inference_steps: int) -> DPMSDEState:
        full = self._full_sigmas()
        ts = np.linspace(0, self.config.num_train_timesteps - 1,
                         num_inference_steps)[::-1].astype(np.float64)
        sigmas = np.interp(ts, np.arange(len(full)), full)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return DPMSDEState(jnp.asarray(ts, jnp.float32), jnp.asarray(sigmas),
                           num_inference_steps)

    def scale_model_input(self, state, sample, i):
        sigma = state.sigmas[i]
        return sample / jnp.sqrt(sigma ** 2 + 1.0).astype(sample.dtype)

    def step(self, state: DPMSDEState, model_output, i, sample, key=None):
        f32 = jnp.float32
        sigma = state.sigmas[i]
        sigma_n = state.sigmas[i + 1]
        s32 = sample.astype(f32)
        if self.config.prediction_type == "epsilon":
            x0 = s32 - sigma * model_output.astype(f32)
        else:
            x0 = model_output.astype(f32)
        # split sigma_n into deterministic down + stochastic up (eta=1 SDE)
        sigma_up = jnp.sqrt(jnp.maximum(
            sigma_n ** 2 * (sigma ** 2 - sigma_n ** 2) / jnp.maximum(sigma ** 2, 1e-12), 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_n ** 2 - sigma_up ** 2, 0.0))
        d = (s32 - x0) / jnp.maximum(sigma, 1e-12)
        prev = s32 + (sigma_down - sigma) * d
        if key is not None:
            prev = prev + sigma_up * jax.random.normal(key, sample.shape)
        return prev.astype(sample.dtype), state
