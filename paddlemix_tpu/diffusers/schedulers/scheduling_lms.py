"""LMS (linear multistep, k-diffusion) + IPNDM schedulers.

Rebuild of the reference's scheduling_lms_discrete.py and scheduling_ipndm.py.
The LMS Adams-Bashforth coefficients are integrals of Lagrange basis
polynomials over each sigma interval — they depend only on the sigma grid, so
they are precomputed as a dense (N, order) matrix at set_timesteps (numpy +
scipy on host) and the jitted step is a pure dot with the derivative history
carried in the state (the reference integrates with scipy inside its python
step loop).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, spaced_timesteps
from .scheduling_euler import _karras_sigmas


@dataclasses.dataclass
class LMSConfig(SchedulerConfig):
    model_type = "lms"
    use_karras_sigmas: bool = False
    timestep_spacing: str = "linspace"
    solver_order: int = 4


class LMSState(NamedTuple):
    timesteps: jnp.ndarray
    sigmas: jnp.ndarray        # (N+1,)
    coeffs: jnp.ndarray        # (N, order) LMS coefficients, zero-padded
    derivs: jnp.ndarray        # (order, *shape) history, most recent first
    num_inference_steps: int


def _lms_coeffs(sigmas: np.ndarray, order: int) -> np.ndarray:
    """coeffs[t, j] = integral of the j-th Lagrange basis over [s_t, s_{t+1}]."""
    from scipy import integrate

    n = len(sigmas) - 1
    out = np.zeros((n, order), np.float64)
    for t in range(n):
        cur_order = min(t + 1, order)
        for j in range(cur_order):
            def fn(tau, t=t, j=j, cur=cur_order):
                prod = 1.0
                for k in range(cur):
                    if k == j:
                        continue
                    prod *= (tau - sigmas[t - k]) / (sigmas[t - j] - sigmas[t - k])
                return prod

            out[t, j] = integrate.quad(fn, sigmas[t], sigmas[t + 1], epsrel=1e-4)[0]
    return out.astype(np.float32)


class LMSDiscreteScheduler(Scheduler):
    config_class = LMSConfig

    @property
    def init_noise_sigma(self) -> float:
        acp = np.asarray(self.alphas_cumprod)
        s = ((1.0 - acp) / acp) ** 0.5
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return float(s.max())
        return float((s.max() ** 2 + 1) ** 0.5)

    def set_timesteps(self, num_inference_steps: int,
                      sample_shape: Tuple[int, ...] = ()) -> LMSState:
        acp = np.asarray(self.alphas_cumprod)
        full = ((1.0 - acp) / acp) ** 0.5
        ts = spaced_timesteps(self.config, num_inference_steps).astype(np.float64)
        sigmas = np.interp(ts, np.arange(len(full)), full)
        if self.config.use_karras_sigmas:
            sigmas = _karras_sigmas(float(full[0]), float(full[-1]), num_inference_steps)
            log_full = np.log(full)
            ts = np.asarray([np.interp(np.log(s), log_full, np.arange(len(full)))
                             for s in sigmas])
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float64)
        coeffs = _lms_coeffs(sigmas, self.config.solver_order)
        return LMSState(jnp.asarray(ts, jnp.float32),
                        jnp.asarray(sigmas, jnp.float32), jnp.asarray(coeffs),
                        jnp.zeros((self.config.solver_order,) + tuple(sample_shape),
                                  jnp.float32),
                        num_inference_steps)

    def scale_model_input(self, state: LMSState, sample, i):
        sigma = state.sigmas[i]
        return sample / jnp.sqrt(sigma ** 2 + 1.0).astype(sample.dtype)

    def step(self, state: LMSState, model_output, i, sample, key=None):
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        sigma = state.sigmas[i]
        pt = self.config.prediction_type
        if pt == "epsilon":
            x0 = x - sigma * out
        elif pt == "v_prediction":
            x0 = out * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + x / (sigma ** 2 + 1)
        else:
            x0 = out
        deriv = (x - x0) / sigma
        # shift history: most recent first
        derivs = jnp.concatenate([deriv[None], state.derivs[:-1]], axis=0)
        c = state.coeffs[i]  # (order,)
        prev = x + jnp.tensordot(c, derivs, axes=(0, 0))
        return prev.astype(sample.dtype), state._replace(derivs=derivs)


@dataclasses.dataclass
class IPNDMConfig(SchedulerConfig):
    model_type = "ipndm"
    num_train_timesteps: int = 1000


class IPNDMState(NamedTuple):
    timesteps: jnp.ndarray
    betas: jnp.ndarray      # ipndm's sigma-like schedule (N+1,)
    ets: jnp.ndarray        # (4, *shape) eps history, most recent first
    step_count: jnp.ndarray
    num_inference_steps: int


class IPNDMScheduler(Scheduler):
    """4th-order improved PNDM (reference scheduling_ipndm.py): fixed
    Adams-Bashforth coefficients over the eps history on a cosine-like
    alpha/beta split schedule."""

    config_class = IPNDMConfig

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        self.alphas_cumprod = None

    def set_timesteps(self, num_inference_steps: int,
                      sample_shape: Tuple[int, ...] = ()) -> IPNDMState:
        n = num_inference_steps
        steps = np.concatenate([np.linspace(1, 0, n + 1)[:-1], [0.0]])
        # reference: betas = sin(pi/2 * s)^2, alphas = sqrt(1 - betas^2),
        # timesteps = atan2(betas, alphas) * 2/pi (last dropped)
        betas = np.sin(steps * np.pi / 2) ** 2
        alphas = np.sqrt(1.0 - betas ** 2)
        ts = (np.arctan2(betas, alphas) / np.pi * 2)[:-1]
        self._alphas = jnp.asarray(alphas, jnp.float32)
        return IPNDMState(jnp.asarray(ts, jnp.float32),
                          jnp.asarray(betas, jnp.float32),
                          jnp.zeros((4,) + tuple(sample_shape), jnp.float32),
                          jnp.zeros((), jnp.int32), n)

    def step(self, state: IPNDMState, model_output, i, sample, key=None):
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        alphas = self._alphas
        betas = state.betas
        # reference ets = sample * beta_i + model_output * alpha_i, then a
        # 1st..4th order Adams-Bashforth average over the history
        et = x * betas[i] + out * alphas[i]
        ets = jnp.concatenate([et[None], state.ets[:-1]], axis=0)
        c = state.step_count
        e1 = ets[0]
        e2 = (3 * ets[0] - ets[1]) / 2
        e3 = (23 * ets[0] - 16 * ets[1] + 5 * ets[2]) / 12
        e4 = (55 * ets[0] - 59 * ets[1] + 37 * ets[2] - 9 * ets[3]) / 24
        eps_avg = jnp.where(c == 0, e1, jnp.where(c == 1, e2, jnp.where(c == 2, e3, e4)))
        pred = (x - betas[i] * eps_avg) / jnp.maximum(alphas[i], 1e-8)
        prev = alphas[i + 1] * pred + eps_avg * betas[i + 1]
        return prev.astype(sample.dtype), state._replace(
            ets=ets, step_count=state.step_count + 1)
