"""LR schedules + param grouping (reference paddlemix/optimization/:
CosineDecayWithWarmup optimization.py:27, FilterParamsName :80,
layer-decay groups) built on optax."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import optax


def cosine_decay_with_warmup(learning_rate: float, total_steps: int,
                             warmup_steps: int = 0, min_lr: float = 0.0):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=max(warmup_steps, 1), decay_steps=max(total_steps, 2),
        end_value=min_lr)


def linear_decay_with_warmup(learning_rate: float, total_steps: int, warmup_steps: int = 0):
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
         optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup_steps, 1))],
        [max(warmup_steps, 1)])


def constant_with_warmup(learning_rate: float, warmup_steps: int = 0):
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
         optax.constant_schedule(learning_rate)],
        [max(warmup_steps, 1)])


SCHEDULES = {
    "cosine": cosine_decay_with_warmup,
    "linear": linear_decay_with_warmup,
    "constant": constant_with_warmup,
}


def no_weight_decay_mask(params):
    """True where weight decay applies (reference FilterParamsName: skips
    norms/biases/1-D params)."""
    import jax

    def keep(path, leaf):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if leaf.ndim <= 1:
            return False
        if any(tok in name for tok in ("norm", "bias", "embedding", "logit_scale")):
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def layer_id_for_param(path: str, num_max_layer: int) -> int:
    """Layer index from a param path (reference
    optimization/clip_optimizer.py:131 get_num_layer_for_transformer):
    embeddings -> 0, block/layer i -> i+1, heads/norm-out -> num_max_layer-1.
    Accepts both torch-style 'blocks.3.' and our flax 'blocks_3' naming."""
    import re

    layer_0 = ("patch_embed", "pos_embed", "cls_token", "mask_token", "conv1",
               "positional_embedding", "token_embedding", "embed_tokens",
               "class_embedding", "position_embedding")
    if any(tok in path for tok in layer_0):
        return 0
    m = re.search(r"(?:blocks|layers)[._](\d+)", path)
    if m is not None:
        return int(m.group(1)) + 1
    return num_max_layer - 1


def layer_decay_scales(params, layer_decay: float, num_layers: int):
    """Per-leaf LR scale pytree: scale = layer_decay^(num_layers+1-layer_id)
    (reference clip_optimizer.py get_assigner/LayerDecayValueAssigner)."""
    import jax

    n = num_layers + 2  # [embeddings, blocks 1..num_layers, head]
    values = [layer_decay ** (n - 1 - i) for i in range(n)]

    def scale(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return values[layer_id_for_param(name, n)]

    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_layer_decay(scales):
    """optax transform multiplying each update by its layer's LR scale —
    the TPU-native form of the reference's per-group learning_rate*lr_scale
    param groups (one jitted update; no python param-group loop)."""
    import jax

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(
    learning_rate=1e-4,
    schedule: str = "cosine",
    total_steps: int = 10000,
    warmup_steps: int = 0,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    min_lr: float = 0.0,
    layer_decay: Optional[float] = None,
    params=None,
    num_layers: Optional[int] = None,
):
    """AdamW + grad clip + schedule — the reference's default optimizer stack
    (create_optimizer_simple + trainer grad clip, trainer/trainer.py:96-100)."""
    if callable(learning_rate):
        lr = learning_rate
    elif schedule == "cosine":
        lr = cosine_decay_with_warmup(learning_rate, total_steps, warmup_steps, min_lr)
    elif schedule == "linear":
        lr = linear_decay_with_warmup(learning_rate, total_steps, warmup_steps)
    else:
        lr = constant_with_warmup(learning_rate, warmup_steps)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(lr, b1=beta1, b2=beta2, eps=eps,
                             weight_decay=weight_decay,
                             mask=no_weight_decay_mask if weight_decay else None))
    if layer_decay is not None and layer_decay < 1.0:
        if params is None or num_layers is None:
            raise ValueError("layer_decay needs params and num_layers to "
                             "build the per-leaf scale tree")
        chain.append(scale_by_layer_decay(
            layer_decay_scales(params, layer_decay, num_layers)))
    return optax.chain(*chain)
