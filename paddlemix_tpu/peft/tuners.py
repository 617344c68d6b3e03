"""LoHA / LoKR / OFT / prompt-tuning adapters.

Rebuild of the reference's remaining PEFT tuners
(ppdiffusers/peft/tuners/loha, lokr, oft, and the prompt-tuning family) in
the same TPU-native merge-on-the-fly design as lora.py: adapter factors live
in a parallel pytree, the effective weight is recomputed inside jit (fusing
into the forward), and only the factors receive gradients.

- LoHA: delta = (a1 @ b1) * (a2 @ b2) — Hadamard product of two low-rank
  factorizations (FedPara).
- LoKR: delta = kron(w1, a2 @ b2) — Kronecker product, w1 a small full
  matrix over the "outer" dim split, the "inner" factor low-rank.
- OFT: W' = R @ W with R block-diagonal orthogonal via the Cayley transform
  R = (I - Q)(I + Q)^-1, Q skew-symmetric per block (norm-preserving).
- Prompt tuning: learned virtual-token embeddings prepended to input embeds.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..core.config import BaseConfig
from .lora import DEFAULT_TARGETS


def _matched_kernels(params, target_modules: str):
    flat = traverse_util.flatten_dict(params)
    for path, leaf in flat.items():
        if re.fullmatch(target_modules, ".".join(path)) and getattr(leaf, "ndim", 0) == 2:
            yield path, leaf


def _factor(n: int) -> Tuple[int, int]:
    """Largest divisor pair (a, b), a <= b, a*b = n (reference lokr
    factorization helper)."""
    a = int(n ** 0.5)
    while n % a:
        a -= 1
    return a, n // a


# ------------------------------------------------------------------- LoHA
@dataclasses.dataclass
class LoHaConfig(BaseConfig):
    model_type = "loha"
    r: int = 8
    alpha: int = 16
    target_modules: str = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def loha_init(params, config: LoHaConfig, rng) -> Dict:
    out = {}
    for path, leaf in _matched_kernels(params, config.target_modules):
        d_in, d_out = leaf.shape
        k1, k2, rng = jax.random.split(rng, 3)
        out[path] = {
            "a1": jax.random.normal(k1, (d_in, config.r), jnp.float32) * 0.01,
            "b1": jax.random.normal(k2, (config.r, d_out), jnp.float32) * 0.01,
            "a2": jax.random.normal(rng, (d_in, config.r), jnp.float32) * 0.01,
            "b2": jnp.zeros((config.r, d_out), jnp.float32),
        }
    if not out:
        raise ValueError(f"no params matched {config.target_modules!r}")
    return out


def loha_merge(params, loha_params: Dict, config: LoHaConfig):
    flat = dict(traverse_util.flatten_dict(params))
    for path, f in loha_params.items():
        w = flat[path]
        delta = (f["a1"] @ f["b1"]) * (f["a2"] @ f["b2"]) * config.scaling
        flat[path] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return traverse_util.unflatten_dict(flat)


# ------------------------------------------------------------------- LoKR
@dataclasses.dataclass
class LoKrConfig(BaseConfig):
    model_type = "lokr"
    r: int = 8
    alpha: int = 16
    target_modules: str = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def lokr_init(params, config: LoKrConfig, rng) -> Dict:
    out = {}
    for path, leaf in _matched_kernels(params, config.target_modules):
        d_in, d_out = leaf.shape
        in1, in2 = _factor(d_in)
        out1, out2 = _factor(d_out)
        k1, k2, rng = jax.random.split(rng, 3)
        out[path] = {
            "w1": jax.random.normal(k1, (in1, out1), jnp.float32) * 0.01,
            "a2": jax.random.normal(k2, (in2, config.r), jnp.float32) * 0.01,
            "b2": jnp.zeros((config.r, out2), jnp.float32),
        }
    if not out:
        raise ValueError(f"no params matched {config.target_modules!r}")
    return out


def lokr_merge(params, lokr_params: Dict, config: LoKrConfig):
    flat = dict(traverse_util.flatten_dict(params))
    for path, f in lokr_params.items():
        w = flat[path]
        w2 = f["a2"] @ f["b2"]  # (in2, out2)
        delta = jnp.kron(f["w1"], w2) * config.scaling  # (in1*in2, out1*out2)
        flat[path] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return traverse_util.unflatten_dict(flat)


# -------------------------------------------------------------------- OFT
@dataclasses.dataclass
class OFTConfig(BaseConfig):
    model_type = "oft"
    block_size: int = 4  # rows per orthogonal block (must divide d_in)
    target_modules: str = DEFAULT_TARGETS


def oft_init(params, config: OFTConfig, rng) -> Dict:
    out = {}
    for path, leaf in _matched_kernels(params, config.target_modules):
        d_in = leaf.shape[0]
        bs = config.block_size
        if d_in % bs:
            continue
        # skew parameters start at 0 -> R = I (identity finetune start)
        out[path] = {"skew": jnp.zeros((d_in // bs, bs, bs), jnp.float32)}
    if not out:
        raise ValueError(f"no params matched {config.target_modules!r} "
                         f"with block_size {config.block_size}")
    return out


def _cayley(skew):
    """(..., b, b) arbitrary -> orthogonal via R = (I - Q)(I + Q)^-1 with
    Q = skew - skew^T (guaranteed skew-symmetric)."""
    q = skew - jnp.swapaxes(skew, -1, -2)
    eye = jnp.eye(q.shape[-1], dtype=q.dtype)
    return jnp.linalg.solve(eye + q, eye - q)


def oft_merge(params, oft_params: Dict, config: OFTConfig):
    flat = dict(traverse_util.flatten_dict(params))
    bs = config.block_size
    for path, f in oft_params.items():
        w = flat[path]
        d_in, d_out = w.shape
        r = _cayley(f["skew"])  # (n_blocks, bs, bs)
        wb = w.astype(jnp.float32).reshape(d_in // bs, bs, d_out)
        rotated = jnp.einsum("nij,njo->nio", r, wb).reshape(d_in, d_out)
        flat[path] = rotated.astype(w.dtype)
    return traverse_util.unflatten_dict(flat)


# --------------------------------------------------------- prompt tuning
@dataclasses.dataclass
class PromptTuningConfig(BaseConfig):
    model_type = "prompt_tuning"
    num_virtual_tokens: int = 20
    token_dim: int = 768
    init_std: float = 0.02


def prompt_init(config: PromptTuningConfig, rng) -> jnp.ndarray:
    return jax.random.normal(rng, (config.num_virtual_tokens,
                                   config.token_dim)) * config.init_std


def apply_prompt(prompt: jnp.ndarray, inputs_embeds: jnp.ndarray):
    """Prepend the virtual tokens: (B, S, D) -> (B, n+S, D)."""
    b = inputs_embeds.shape[0]
    virt = jnp.broadcast_to(prompt[None], (b, *prompt.shape))
    return jnp.concatenate([virt.astype(inputs_embeds.dtype), inputs_embeds], 1)


def peft_loss_fn(base_loss_fn: Callable, base_params, merge_fn, config) -> Callable:
    """Generic factor-training wrapper (same contract as lora_loss_fn)."""

    def fn(adapter_params, batch, rng):
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)
        eff = merge_fn(frozen, adapter_params, config)
        return base_loss_fn(eff, batch, rng)

    return fn
