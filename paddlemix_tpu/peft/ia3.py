"""IA3 (Infused Adapter by Inhibiting and Amplifying Inner Activations),
merge-on-the-fly (reference ppdiffusers/peft/tuners/ia3/): a learned scaling
vector per target projection. Attention k/v targets scale the OUTPUT features
(W * l[None, :]); feedforward targets scale the INPUT features
(W * l[:, None]), matching the HF-PEFT convention."""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..core.config import BaseConfig

DEFAULT_TARGETS = r".*(k_proj|v_proj|to_k|to_v|down_proj|fc2|wo)\.kernel$"
DEFAULT_FEEDFORWARD = r".*(down_proj|fc2|wo)\.kernel$"


@dataclasses.dataclass
class IA3Config(BaseConfig):
    model_type = "ia3"
    target_modules: str = DEFAULT_TARGETS
    feedforward_modules: str = DEFAULT_FEEDFORWARD


def _is_ff(config: IA3Config, path) -> bool:
    return bool(re.fullmatch(config.feedforward_modules, ".".join(path)))


def ia3_init(params, config: IA3Config) -> Dict:
    """{path: {"l": ones vector}} — input-dim for ff targets, output-dim else."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        name = ".".join(path)
        if re.fullmatch(config.target_modules, name) and getattr(leaf, "ndim", 0) == 2:
            dim = leaf.shape[0] if _is_ff(config, path) else leaf.shape[1]
            out[path] = {"l": jnp.ones((dim,), jnp.float32)}
    if not out:
        raise ValueError(f"no params matched IA3 targets {config.target_modules!r}")
    return out


def merge_params(params, ia3_params: Dict, config: IA3Config):
    """Effective params: W * l (axis chosen by target kind; jit-fusable)."""
    flat = dict(traverse_util.flatten_dict(params))
    for path, entry in ia3_params.items():
        w = flat[path]
        l = entry["l"].astype(jnp.float32)
        if _is_ff(config, path):
            scaled = w.astype(jnp.float32) * l[:, None]
        else:
            scaled = w.astype(jnp.float32) * l[None, :]
        flat[path] = scaled.astype(w.dtype)
    return traverse_util.unflatten_dict(flat)


def ia3_loss_fn(base_loss_fn: Callable, base_params, config: IA3Config) -> Callable:
    """Train only the IA3 vectors; base params frozen via stop_gradient."""

    def fn(ia3_params, batch, rng):
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)
        eff = merge_params(frozen, ia3_params, config)
        return base_loss_fn(eff, batch, rng)

    return fn
