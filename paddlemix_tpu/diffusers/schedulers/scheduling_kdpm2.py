"""KDPM2 (Karras DPM-2) discrete + ancestral schedulers.

Rebuild of the reference's scheduling_k_dpm_2_discrete.py /
scheduling_k_dpm_2_ancestral_discrete.py as pure state pytrees. The solver is
2nd order: each denoise *step* is two model evaluations (one at sigma, one at
the log-space midpoint), so ``len(state.timesteps) == 2 * steps - 1`` and the
jitted loop runs over that expanded axis; even i = first-order substep (the
sample is stashed in the state carry), odd i = second-order substep.

The stash lives in the loop-carried state, so ``set_timesteps`` needs the
sample shape (fori_loop carries must be shape-stable).
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
class KDPM2Config(SchedulerConfig):
    model_type = "kdpm2"
    use_karras_sigmas: bool = False
    timestep_spacing: str = "linspace"
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"


class KDPM2State(NamedTuple):
    timesteps: jnp.ndarray        # (2N-1,) float32
    sigmas: jnp.ndarray           # (2N+2,) expanded
    sigmas_interpol: jnp.ndarray  # (2N+2,) expanded
    sigmas_up: jnp.ndarray        # (2N+2,) expanded (ancestral; zeros otherwise)
    sigmas_down: jnp.ndarray      # (2N+2,) expanded
    stash: jnp.ndarray            # first-order sample, carried to the 2nd substep
    num_inference_steps: int


def _sigma_to_t(sigma, log_sigmas):
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, None]
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(max=len(log_sigmas) - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return ((1 - w) * low_idx + w * high_idx).reshape(np.shape(sigma))


def _expand(a):
    # [a0] + each of a1.. twice + [a_last]
    return np.concatenate([a[:1], np.repeat(a[1:], 2), a[-1:]]).astype(np.float32)


class KDPM2DiscreteScheduler(Scheduler):
    config_class = KDPM2Config
    order = 2
    ancestral = False

    @property
    def init_noise_sigma(self) -> float:
        acp = np.asarray(self.alphas_cumprod)
        s = ((1.0 - acp) / acp) ** 0.5
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return float(s.max())
        return float((s.max() ** 2 + 1) ** 0.5)

    def set_timesteps(self, num_inference_steps: int,
                      shape: Tuple[int, ...] = ()) -> KDPM2State:
        acp = np.asarray(self.alphas_cumprod)
        full = ((1.0 - acp) / acp) ** 0.5
        log_full = np.log(full)
        ts = spaced_timesteps(self.config, num_inference_steps).astype(np.float64)
        sigmas = np.interp(ts, np.arange(len(full)), full)
        if self.config.use_karras_sigmas:
            sigmas = _karras_sigmas(float(full[0]), float(full[-1]), num_inference_steps)
            ts = _sigma_to_t(sigmas, log_full).round()
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float64)

        if self.ancestral:
            s_next = np.roll(sigmas, -1)
            s_next[-1] = 0.0
            up = (s_next ** 2 * (sigmas ** 2 - s_next ** 2)
                  / np.maximum(sigmas ** 2, 1e-20)) ** 0.5
            down = np.maximum(s_next ** 2 - up ** 2, 0.0) ** 0.5
            down[-1] = 0.0
            interpol = np.exp(0.5 * (np.log(np.maximum(sigmas, 1e-20))
                                     + np.log(np.maximum(down, 1e-20))))
            interpol[-2:] = 0.0
        else:
            up = np.zeros_like(sigmas)
            down = np.zeros_like(sigmas)
            # geometric midpoint with the PREVIOUS sigma (reference
            # sigmas.log().lerp(sigmas.roll(1).log(), 0.5).exp())
            interpol = np.exp(0.5 * (np.log(np.maximum(sigmas, 1e-20))
                                     + np.log(np.maximum(np.roll(sigmas, 1), 1e-20))))
            interpol[-1] = 0.0

        t_interpol = _sigma_to_t(interpol, log_full)
        if self.ancestral:
            inter = np.stack([t_interpol[:-2], ts[1:]], axis=-1).reshape(-1)
        else:
            inter = np.stack([t_interpol[1:-1], ts[1:]], axis=-1).reshape(-1)
        timesteps = np.concatenate([ts[:1], inter]).astype(np.float32)

        return KDPM2State(
            jnp.asarray(timesteps),
            jnp.asarray(_expand(sigmas)),
            jnp.asarray(_expand(interpol)),
            jnp.asarray(_expand(up)),
            jnp.asarray(_expand(down)),
            jnp.zeros(shape, jnp.float32),
            num_inference_steps,
        )

    def scale_model_input(self, state: KDPM2State, sample, i):
        first = (i % 2) == 0
        if self.ancestral:
            sigma = jnp.where(first, state.sigmas[i], state.sigmas_interpol[i - 1])
        else:
            sigma = jnp.where(first, state.sigmas[i], state.sigmas_interpol[i])
        return (sample / jnp.sqrt(sigma ** 2 + 1.0).astype(sample.dtype))

    def _x0(self, model_output, sample, sigma):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return sample - sigma * model_output
        if pt == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + sample / (sigma ** 2 + 1)
        raise ValueError(f"prediction_type {pt!r} unsupported for KDPM2")

    def step(self, state: KDPM2State, model_output, i, sample, key=None):
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        first = (i % 2) == 0
        if self.ancestral:
            sigma = jnp.where(first, state.sigmas[i], state.sigmas[i - 1])
            interpol = jnp.where(first, state.sigmas_interpol[i],
                                 state.sigmas_interpol[i - 1])
            sigma_up = state.sigmas_up[i - 1]
            sigma_down = jnp.where(first, state.sigmas_down[i - 1],
                                   state.sigmas_down[i - 1])
            dt2 = sigma_down - sigma
        else:
            sigma = jnp.where(first, state.sigmas[i], state.sigmas[i - 1])
            interpol = jnp.where(first, state.sigmas_interpol[i + 1],
                                 state.sigmas_interpol[i])
            sigma_next = state.sigmas[jnp.where(first, i + 1, i)]
            dt2 = sigma_next - sigma

        sigma_input = jnp.where(first, sigma, interpol)
        x0 = self._x0(out, x, sigma_input)
        derivative = (x - x0) / sigma_input

        prev_first = x + derivative * (interpol - sigma)
        base = state.stash.astype(jnp.float32)
        prev_second = base + derivative * dt2
        if self.ancestral and key is not None:
            prev_second = prev_second + sigma_up * jax.random.normal(key, x.shape)

        prev = jnp.where(first, prev_first, prev_second)
        new_stash = jnp.where(first, x, state.stash.astype(jnp.float32))
        return prev.astype(sample.dtype), state._replace(
            stash=new_stash.astype(state.stash.dtype))


class KDPM2AncestralDiscreteScheduler(KDPM2DiscreteScheduler):
    ancestral = True
