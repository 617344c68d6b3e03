"""Rotary position embeddings, including Qwen2-VL's multimodal M-RoPE.

TPU-native equivalent of:
 - triton fused_rotary_emb (reference paddlemix/triton_ops/triton_ops.py:1473)
 - M-RoPE section layout (reference
   paddlemix/models/qwen2_vl/modeling_qwen2_vl.py:179 apply_multimodal_rotary_pos_emb)

Rope is bandwidth-bound elementwise work that XLA fuses into the surrounding
matmuls, so the implementation is pure jnp (a separate Pallas kernel would
only add a fusion barrier on TPU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float = 10000.0,
                 scaling: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions: (..., S) int -> cos/sin: (..., S, head_dim) (half-duplicated)."""
    inv_freq = rope_frequencies(head_dim, theta)
    angles = positions[..., None].astype(jnp.float32) * inv_freq / scaling
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """q/k: (B, S, H, D) or (B, S, D); cos/sin: (B, S, D) or (S, D)."""
    if q.ndim == 4 and cos.ndim == 3:
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    elif q.ndim == 4 and cos.ndim == 2:
        cos, sin = cos[None, :, None, :], sin[None, :, None, :]
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out, k_out


def mrope_cos_sin(position_ids: jnp.ndarray, head_dim: int,
                  mrope_section: Sequence[int], theta: float = 10000.0):
    """Qwen2-VL M-RoPE: 3 position streams (t, h, w) interleaved by section.

    position_ids: (3, B, S). mrope_section: e.g. (16, 24, 24) halves summing to
    head_dim//2. Returns cos/sin: (B, S, head_dim)."""
    cos3, sin3 = rope_cos_sin(position_ids, head_dim, theta)  # (3, B, S, D)
    sections = list(mrope_section) * 2  # duplicated halves
    cos_parts, sin_parts = [], []
    offset = 0
    for i, sec in enumerate(sections):
        stream = i % 3
        cos_parts.append(cos3[stream, :, :, offset:offset + sec])
        sin_parts.append(sin3[stream, :, :, offset:offset + sec])
        offset += sec
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope_gptj(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """GPT-J interleaved variant (pairs (0,1),(2,3),...) used by some ViTs."""

    def rotate_pairs(x):
        x1 = x[..., ::2]
        x2 = x[..., 1::2]
        return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)

    if q.ndim == 4 and cos.ndim == 3:
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    return q * cos + rotate_pairs(q) * sin, k * cos + rotate_pairs(k) * sin
