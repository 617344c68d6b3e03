"""LoRA, merge-on-the-fly: works with ANY flax model, no module surgery.

Rebuild of the reference's two LoRA stacks (paddlenlp.peft LoRAModel used by
supervised_finetune.py:143-159 and the ppdiffusers/peft clone
tuners/lora/) with a TPU-native design: LoRA factors live in a parallel
pytree; ``merge_params`` computes W + scale·(A@B) right before ``apply``.
Under jit the merge fuses into the surrounding graph; gradients flow only to
the factors (base params enter via stop_gradient in lora_loss_fn)."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..core.config import BaseConfig

DEFAULT_TARGETS = (r".*(q_proj|k_proj|v_proj|o_proj|out_proj|gate_proj|up_proj|down_proj|"
                   r"to_q|to_k|to_v|to_out|qkv|fc1|fc2)\.kernel$")


@dataclasses.dataclass
class LoraConfig(BaseConfig):
    model_type = "lora"
    r: int = 8
    lora_alpha: int = 16
    target_modules: str = DEFAULT_TARGETS
    lora_dropout: float = 0.0

    @property
    def scaling(self) -> float:
        return self.lora_alpha / self.r


def lora_init(params, config: LoraConfig, rng) -> Dict:
    """Create {path: {"a": (in, r), "b": (r, out)}} for every matched kernel."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    i = 0
    for path, leaf in flat.items():
        name = ".".join(path)
        if re.fullmatch(config.target_modules, name) and getattr(leaf, "ndim", 0) == 2:
            d_in, d_out = leaf.shape
            a = jax.random.normal(keys[i], (d_in, config.r), jnp.float32) * 0.01
            b = jnp.zeros((config.r, d_out), jnp.float32)
            out[path] = {"a": a, "b": b}
            i += 1
    if not out:
        raise ValueError(f"no params matched LoRA targets {config.target_modules!r}")
    return out


def merge_params(params, lora_params: Dict, config: LoraConfig, merge: bool = True):
    """Effective params: W + scale * A @ B (jit-fusable)."""
    flat = dict(traverse_util.flatten_dict(params))
    for path, ab in lora_params.items():
        w = flat[path]
        delta = (ab["a"] @ ab["b"]) * config.scaling
        flat[path] = (w.astype(jnp.float32) + delta).astype(w.dtype) if merge else w
    return traverse_util.unflatten_dict(flat)


def lora_loss_fn(base_loss_fn: Callable, base_params, config: LoraConfig) -> Callable:
    """Wrap loss_fn(params, batch, rng) into loss_fn(lora_params, batch, rng):
    base params frozen (stop_gradient), only LoRA factors train."""

    def fn(lora_params, batch, rng):
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)
        eff = merge_params(frozen, lora_params, config)
        return base_loss_fn(eff, batch, rng)

    return fn


def merge_lora_into_model(model, lora_params: Dict, config: LoraConfig):
    """Permanently fold LoRA into the model (reference
    paddlemix/tools/merge_lora_params.py)."""
    model.params = merge_params(model.params, lora_params, config)
    return model


def save_lora(lora_params: Dict, config: LoraConfig, path: str):
    import os

    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    config.save_pretrained(path)
    flat = {}
    for p, ab in lora_params.items():
        flat[".".join(p) + ".lora_a"] = np.asarray(ab["a"])
        flat[".".join(p) + ".lora_b"] = np.asarray(ab["b"])
    save_file(flat, os.path.join(path, "adapter_model.safetensors"))


def load_lora(path: str) -> Tuple[Dict, LoraConfig]:
    import os

    from safetensors import safe_open

    config = LoraConfig.from_pretrained(path)
    out: Dict = {}
    with safe_open(os.path.join(path, "adapter_model.safetensors"), framework="np") as f:
        for k in f.keys():
            base, kind = k.rsplit(".lora_", 1)
            out.setdefault(tuple(base.split(".")), {})["a" if kind == "a" else "b"] = \
                jnp.asarray(f.get_tensor(k))
    return out, config
