"""Inversion + parallel-sampling scheduler variants.

Rebuilds of the reference's scheduling_ddim_inverse.py,
scheduling_dpmsolver_multistep_inverse.py, scheduling_ddim_parallel.py and
scheduling_ddpm_parallel.py:

- inverse schedulers run the diffusion FORWARD (image -> noise) for editing /
  inversion workflows; timesteps ascend and each step re-noises to the next
  (noisier) level.
- parallel schedulers add ``batch_step_no_noise``: one vectorized update for a
  whole BATCH of timesteps at once (ParaDiGMS parallel sampling). Our steps
  are already pure functions of (t, prev_t), so the batch form is a vmap.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, predicted_eps, predicted_x0
from .scheduling_ddim import DDIMConfig, DDIMScheduler, DDIMState
from .scheduling_ddpm import DDPMConfig, DDPMScheduler
from .scheduling_dpmsolver import DPMSolverConfig, DPMSolverMultistepScheduler, DPMSolverState


@dataclasses.dataclass
class DDIMInverseConfig(DDIMConfig):
    model_type = "ddim_inverse"
    set_alpha_to_zero: bool = True


class DDIMInverseScheduler(Scheduler):
    """DDIM inversion (reference scheduling_ddim_inverse.py): timesteps ascend
    0..T and each step maps x_t -> x_{t_next} with the deterministic DDIM ODE."""

    config_class = DDIMInverseConfig

    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        n = self.config.num_train_timesteps
        ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64)
        # current level of each step is the PREVIOUS timestep (t - ratio, <0 =
        # clean); target level is ts itself (reference rolls the pair forward)
        cur = ts - ratio
        return DDIMState(timesteps=jnp.asarray(ts, jnp.int32),
                         prev_timesteps=jnp.asarray(cur, jnp.int32),
                         num_inference_steps=num_inference_steps)

    def step(self, state: DDIMState, model_output, i, sample, key=None):
        cfg = self.config
        t_next = state.timesteps[i]
        t_cur = state.prev_timesteps[i]
        acp = self.alphas_cumprod
        initial_alpha = jnp.asarray(1.0 if cfg.set_alpha_to_zero else float(acp[0]))
        alpha_prod_t = jnp.where(t_cur >= 0, acp[jnp.maximum(t_cur, 0)], initial_alpha)
        alpha_prod_next = acp[t_next]

        x0 = predicted_x0(model_output, sample, alpha_prod_t, cfg.prediction_type)
        eps = predicted_eps(model_output, sample, alpha_prod_t, cfg.prediction_type)
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)
        prev = jnp.sqrt(alpha_prod_next) * x0 + jnp.sqrt(1.0 - alpha_prod_next) * eps
        return prev.astype(sample.dtype), state


@dataclasses.dataclass
class DPMSolverInverseConfig(DPMSolverConfig):
    model_type = "dpmsolver++_inverse"


class DPMSolverMultistepInverseScheduler(DPMSolverMultistepScheduler):
    """DPM-Solver++ run forward for inversion (reference
    scheduling_dpmsolver_multistep_inverse.py): identical multistep update on
    the time-reversed (ascending-noise) schedule."""

    config_class = DPMSolverInverseConfig

    def set_timesteps(self, num_inference_steps: int, sample_shape=(1,),
                      dtype=jnp.float32) -> DPMSolverState:
        state = super().set_timesteps(num_inference_steps, sample_shape, dtype)
        # reverse: start clean (alpha ~ 1) and walk toward noise
        ts = state.timesteps[::-1]
        alpha_t = jnp.concatenate([jnp.asarray([1.0 - 1e-9]), state.alpha_t[:-1][::-1]])
        sigma_t = jnp.concatenate([jnp.asarray([1e-9]), state.sigma_t[:-1][::-1]])
        lambda_t = jnp.log(alpha_t) - jnp.log(jnp.maximum(sigma_t, 1e-10))
        return state._replace(timesteps=ts, alpha_t=alpha_t, sigma_t=sigma_t,
                              lambda_t=lambda_t)

    def step(self, state, model_output, i, sample, key=None):
        # current level = alpha_t[i] (index 0 = clean), next = alpha_t[i+1]
        # but the parent's step indexes [i] as current and [i+1] as next, so
        # the reversed arrays from set_timesteps make the parent math walk
        # toward noise directly
        return super().step(state, model_output, i, sample, key=key)


@dataclasses.dataclass
class DDIMParallelConfig(DDIMConfig):
    model_type = "ddim_parallel"


class DDIMParallelScheduler(DDIMScheduler):
    """DDIM + batched no-noise step over many timesteps at once
    (reference scheduling_ddim_parallel.py batch_step_no_noise)."""

    config_class = DDIMParallelConfig

    def batch_step_no_noise(self, state: DDIMState, model_outputs, indices, samples):
        """model_outputs/samples: (K, ...) stacked; indices: (K,) into
        state.timesteps. Returns the K updated samples (eta = 0)."""

        def one(mo, idx, s):
            prev, _ = self.step(state, mo, idx, s)
            return prev

        return jax.vmap(one)(model_outputs, indices, samples)


@dataclasses.dataclass
class DDPMParallelConfig(DDPMConfig):
    model_type = "ddpm_parallel"


class DDPMParallelScheduler(DDPMScheduler):
    """DDPM + batched no-noise step (reference scheduling_ddpm_parallel.py)."""

    config_class = DDPMParallelConfig

    def batch_step_no_noise(self, state, model_outputs, indices, samples):
        def one(mo, idx, s):
            prev, _ = self.step(state, mo, idx, s, key=None)
            return prev

        return jax.vmap(one)(model_outputs, indices, samples)
