"""EMA of model params (reference ppdiffusers/training_utils.py:101-260
EMAModel with decay warmup)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any
    count: jnp.ndarray  # () int32


def ema_init(params) -> EMAState:
    return EMAState(jax.tree_util.tree_map(lambda x: x, params), jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params, decay: float = 0.9999,
               use_warmup: bool = True, inv_gamma: float = 1.0, power: float = 2 / 3) -> EMAState:
    count = state.count + 1
    if use_warmup:
        step = count.astype(jnp.float32)
        cur_decay = 1.0 - (1.0 + step / inv_gamma) ** -power
        cur_decay = jnp.clip(cur_decay, 0.0, decay)
    else:
        cur_decay = jnp.asarray(decay)
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * cur_decay + p.astype(e.dtype) * (1.0 - cur_decay),
        state.params, new_params)
    return EMAState(new_ema, count)
