"""PNDM scheduler, skip-prk variant (reference
ppdiffusers/schedulers/scheduling_pndm.py with skip_prk_steps=True, the SD1.x
default): linear multistep over epsilon history."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig, spaced_timesteps


@dataclasses.dataclass
class PNDMConfig(SchedulerConfig):
    model_type = "pndm"
    skip_prk_steps: bool = True
    set_alpha_to_one: bool = False


class PNDMState(NamedTuple):
    timesteps: jnp.ndarray
    prev_timesteps: jnp.ndarray
    ets: jnp.ndarray         # (4, *sample) epsilon history ring
    ets_count: jnp.ndarray   # () int32
    cur_sample: jnp.ndarray
    num_inference_steps: int


class PNDMScheduler(Scheduler):
    config_class = PNDMConfig

    def set_timesteps(self, num_inference_steps: int, sample_shape: Tuple[int, ...] = (1,),
                      dtype=jnp.float32) -> PNDMState:
        ts = spaced_timesteps(self.config, num_inference_steps)
        step = self.config.num_train_timesteps // num_inference_steps
        return PNDMState(jnp.asarray(ts, jnp.int32), jnp.asarray(ts - step, jnp.int32),
                         jnp.zeros((4, *sample_shape), dtype), jnp.zeros((), jnp.int32),
                         jnp.zeros(sample_shape, dtype), num_inference_steps)

    def _prev_sample(self, sample, t, prev_t, eps):
        acp = self.alphas_cumprod
        a_t = acp[t]
        a0 = jnp.asarray(1.0) if self.config.set_alpha_to_one else acp[0]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], a0)
        # PNDM transfer formula (reference _get_prev_sample)
        sample_coeff = jnp.sqrt(a_prev / a_t)
        denom = a_t * jnp.sqrt(1.0 - a_prev) + jnp.sqrt(a_t * a_prev * (1.0 - a_t))
        eps_coeff = (a_prev - a_t) / denom
        return sample_coeff * sample - eps_coeff * eps

    def step(self, state: PNDMState, model_output, i, sample, key=None):
        f32 = jnp.float32
        eps = model_output.astype(f32)
        s32 = sample.astype(f32)
        t = state.timesteps[i]
        prev_t = state.prev_timesteps[i]

        ets = jnp.roll(state.ets, shift=-1, axis=0).at[-1].set(eps.astype(state.ets.dtype))
        n = jnp.minimum(state.ets_count + 1, 4)
        e1, e2, e3, e4 = ets[-1].astype(f32), ets[-2].astype(f32), ets[-3].astype(f32), ets[-4].astype(f32)
        lms1 = e1
        lms2 = (3 * e1 - e2) / 2
        lms3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        lms4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24
        eps_lms = jnp.where(n == 1, lms1,
                            jnp.where(n == 2, lms2, jnp.where(n == 3, lms3, lms4)))
        prev = self._prev_sample(s32, t, prev_t, eps_lms)
        return prev.astype(sample.dtype), state._replace(ets=ets, ets_count=state.ets_count + 1)
