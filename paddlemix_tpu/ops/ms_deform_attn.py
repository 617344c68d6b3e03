"""Multi-scale deformable attention (GroundingDINO / deformable-DETR core op).

TPU-native equivalent of the reference CUDA op
(paddlemix/models/groundingdino/csrc/ms_deformable_attn_op.cu, 1073 LoC fwd+bwd
+ python fallback ms_deform_attn.py:117-121): on TPU the op is expressed as a
vectorized gather + bilinear interpolation that XLA fuses; the backward pass
comes from autodiff over the same graph (no hand-written bwd kernel needed —
gather/scatter transpose natively). Matches the reference op's signature:

  value:                  (B, S, H, D)   flattened multi-level feature map
  value_spatial_shapes:   list of (h, w) per level (static python ints)
  sampling_locations:     (B, Q, H, L, P, 2) in [0, 1]
  attention_weights:      (B, Q, H, L, P)
  -> (B, Q, H*D)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(value_level, loc_xy):
    """value_level: (B, h, w, H, D); loc_xy: (B, Q, H, P, 2) in [0,1] ->
    (B, Q, H, P, D). Out-of-range samples contribute zero (matches the CUDA
    op's border handling)."""
    b, h, w, nh, d = value_level.shape
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        bidx = jnp.arange(b)[:, None, None, None]
        hidx = jnp.arange(nh)[None, None, :, None]
        vals = value_level[bidx, yi, xi, hidx]  # (B, Q, H, P, D)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx0, wx1 = (1 - dx)[..., None], dx[..., None]
    wy0, wy1 = (1 - dy)[..., None], dy[..., None]
    return (v00 * wy0 * wx0 + v01 * wy0 * wx1 + v10 * wy1 * wx0 + v11 * wy1 * wx1)


def ms_deform_attn(
    value: jnp.ndarray,
    value_spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    b, s, nh, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    assert n_levels == len(value_spatial_shapes)
    out = jnp.zeros((b, q, nh, d), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(value_spatial_shapes):
        vl = value[:, offset: offset + h * w].reshape(b, h, w, nh, d)
        offset += h * w
        sampled = _bilinear_sample(vl.astype(jnp.float32),
                                   sampling_locations[:, :, :, lvl].astype(jnp.float32))
        out = out + jnp.sum(
            sampled * attention_weights[:, :, :, lvl, :, None].astype(jnp.float32), axis=3)
    return out.reshape(b, q, nh * d).astype(value.dtype)
