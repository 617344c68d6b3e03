"""AdaLoRA: SVD-parameterized LoRA with importance-driven rank allocation
(reference ppdiffusers/peft/tuners/adalora/). Factors are {P (in, r),
E (r,), Q (r, out)} with delta = P @ diag(E * mask) @ Q; the RankAllocator
keeps an EMA of the sensitivity |E * dL/dE|, and prunes the globally
least-important singular values down to the target budget as training
progresses. Everything is pytree + pure functions, so the allocator update
composes with jit/pjit training steps."""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..core.config import BaseConfig
from .lora import DEFAULT_TARGETS


@dataclasses.dataclass
class AdaLoraConfig(BaseConfig):
    model_type = "adalora"
    init_r: int = 12
    target_r: int = 4
    lora_alpha: int = 16
    target_modules: str = DEFAULT_TARGETS
    beta1: float = 0.85  # sensitivity EMA
    beta2: float = 0.85  # uncertainty EMA
    tinit: int = 0       # steps before pruning starts
    tfinal: int = 0      # steps of final budget before freeze

    @property
    def scaling(self) -> float:
        return self.lora_alpha / self.init_r


def adalora_init(params, config: AdaLoraConfig, rng) -> Dict:
    flat = traverse_util.flatten_dict(params)
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    i = 0
    r = config.init_r
    for path, leaf in flat.items():
        name = ".".join(path)
        if re.fullmatch(config.target_modules, name) and getattr(leaf, "ndim", 0) == 2:
            d_in, d_out = leaf.shape
            k1, k2 = jax.random.split(keys[i])
            out[path] = {
                "p": jax.random.normal(k1, (d_in, r), jnp.float32) * 0.02,
                "e": jnp.zeros((r,), jnp.float32),
                "q": jax.random.normal(k2, (r, d_out), jnp.float32) * 0.02,
                "mask": jnp.ones((r,), jnp.float32),
            }
            i += 1
    if not out:
        raise ValueError(f"no params matched AdaLoRA targets {config.target_modules!r}")
    return out


def merge_params(params, ada_params: Dict, config: AdaLoraConfig):
    flat = dict(traverse_util.flatten_dict(params))
    for path, f in ada_params.items():
        w = flat[path]
        delta = (f["p"] * (f["e"] * f["mask"])[None, :]) @ f["q"] * config.scaling
        flat[path] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return traverse_util.unflatten_dict(flat)


def adalora_loss_fn(base_loss_fn: Callable, base_params,
                    config: AdaLoraConfig) -> Callable:
    def fn(ada_params, batch, rng):
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)
        eff = merge_params(frozen, ada_params, config)
        return base_loss_fn(eff, batch, rng)

    return fn


def allocator_init(ada_params: Dict) -> Dict:
    return {path: {"sens": jnp.zeros_like(f["e"]),
                   "unc": jnp.zeros_like(f["e"])}
            for path, f in ada_params.items()}


def allocator_update(ada_params: Dict, grads: Dict, alloc_state: Dict,
                     step, total_steps: int, config: AdaLoraConfig):
    """One RankAllocator tick: EMA the sensitivity |E*dE|, compute the
    current budget via the cubic schedule, and mask the globally
    least-important singular values. Pure; safe inside jit."""
    new_state = {}
    scores = []
    for path, f in ada_params.items():
        s = jnp.abs(f["e"] * grads[path]["e"])
        sens = config.beta1 * alloc_state[path]["sens"] + (1 - config.beta1) * s
        unc = config.beta2 * alloc_state[path]["unc"] + \
            (1 - config.beta2) * jnp.abs(s - sens)
        new_state[path] = {"sens": sens, "unc": unc}
        scores.append(sens * unc)
    flat_scores = jnp.concatenate(scores)
    n = flat_scores.shape[0]
    n_layers = len(ada_params)

    # cubic budget schedule (AdaLoRA eq. 9)
    init_total = n
    final_total = config.target_r * n_layers
    t = jnp.clip((step - config.tinit) /
                 jnp.maximum(total_steps - config.tinit - config.tfinal, 1), 0.0, 1.0)
    budget = final_total + (init_total - final_total) * (1 - t) ** 3
    budget = jnp.round(budget).astype(jnp.int32)

    # keep the top-`budget` scores globally
    order = jnp.argsort(-flat_scores)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
    keep = (ranks < budget).astype(jnp.float32)

    new_params = {}
    offset = 0
    for path, f in ada_params.items():
        r = f["e"].shape[0]
        new_params[path] = {**f, "mask": keep[offset:offset + r]}
        offset += r
    return new_params, new_state
