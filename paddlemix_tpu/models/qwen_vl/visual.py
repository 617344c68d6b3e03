"""Qwen-VL (v1) visual tower: ViT-bigG + cross-attention Resampler.

Rebuild of the reference tower (paddlemix/models/qwen_vl/qwen_vit.py:267 —
448px/patch-14 ViT, width 1664, 48 layers, heads 16, mlp_ratio 4.9231, fused
in_proj attention, NO cls token, learnable 16x16 pos embed bicubic-interpolated
to the patch grid via get_abs_pos; and visual.py:73-193 — 256-query Resampler
with 2D sincos pos embeds on query+key, then ln_post + output projection).

TPU notes: the bicubic pos-embed interpolation is expressed as two small
matmuls with a precomputed (static-shape) interpolation matrix instead of a
gather-based image resize — exact torch `F.interpolate(mode="bicubic",
align_corners=False)` semantics, and it rides the MXU.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class QwenVisionConfig(BaseConfig):
    """Defaults are the real Qwen-VL ViT-bigG geometry (qwen_vit.py:220)."""

    model_type = "qwen_vision"
    image_size: int = 448
    patch_size: int = 14
    width: int = 1664
    layers: int = 48
    heads: int = 16
    mlp_ratio: float = 4.9231
    output_dim: int = 4096
    pos_embed_size: int = 16  # sqrt of the stored pos-embed length (256)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size^2, embed_dim) 2D sincos table (reference visual.py:30)."""
    def one_dim(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    emb_h = one_dim(embed_dim // 2, grid[0])
    emb_w = one_dim(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def _bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-stochastic interpolation matrix matching torch
    `F.interpolate(mode="bicubic", align_corners=False)` (a=-0.75, border
    clamp). Static sizes -> computed once at trace time in numpy."""
    a = -0.75

    def cubic(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    scale = src / dst
    m = np.zeros((dst, src), np.float64)
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for t in range(-1, 3):
            j = x0 + t
            w = cubic(x - j)
            m[i, min(max(j, 0), src - 1)] += w
    return m.astype(np.float32)


def get_abs_pos(pos_embed, tgt_len: int):
    """Interpolate a (S*S, D) pos embed to (T*T, D), T = sqrt(tgt_len)
    (reference qwen_vit.py:27 get_abs_pos). Identity when sizes match."""
    src = int(round(float(np.sqrt(pos_embed.shape[0]))))
    tgt = int(round(float(np.sqrt(tgt_len))))
    if src == tgt:
        return pos_embed
    m = jnp.asarray(_bicubic_matrix(src, tgt))
    x = pos_embed.reshape(src, src, -1).astype(jnp.float32)
    x = jnp.einsum("ts,shd->thd", m, x)       # rows
    x = jnp.einsum("us,hsd->hud", m, x)       # cols
    return x.reshape(tgt * tgt, -1).astype(pos_embed.dtype)


class VisualAttentionBlock(nn.Module):
    """Pre-LN ViT block with fused in_proj qkv (qwen_vit.py:47-179)."""

    width: int
    heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.width
        hd = d // self.heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")(h)
        b, n, _ = qkv.shape
        # reference splits the fused (3d) projection per-head interleaved:
        # (..., heads, 3*hd) -> q|k|v (qwen_vit.py:78-86)
        qkv = qkv.reshape(b, n, self.heads, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = scaled_dot_product_attention(q, k, v)
        o = nn.Dense(d, dtype=self.dtype, name="out_proj")(o.reshape(b, n, d))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="c_proj")(h)
        return x + h


class Resampler(nn.Module):
    """256 learned queries cross-attend the patch grid once, with 2D sincos
    pos embeds added to query AND key (reference visual.py:73-138)."""

    num_queries: int
    out_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats):
        b, n, _ = image_feats.shape
        d = self.out_dim
        grid = int(np.sqrt(self.num_queries))
        nq = grid * grid  # reference: num_queries = int(sqrt(n))^2
        queries = self.param("query", nn.initializers.normal(0.02), (nq, d))
        pos_embed = self.param(
            "pos_embed",
            lambda key, shape: jnp.asarray(get_2d_sincos_pos_embed(d, grid)),
            (nq, d))
        kv = nn.Dense(d, use_bias=False, dtype=self.dtype, name="kv_proj")(image_feats)
        kv = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_kv")(kv)
        q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_q")(
            queries.astype(self.dtype))
        q_in = jnp.broadcast_to((q + pos_embed.astype(q.dtype))[None], (b, nq, d))
        k_in = kv + get_abs_pos(pos_embed, n).astype(kv.dtype)[None]
        hd = d // self.num_heads
        qq = nn.Dense(d, dtype=self.dtype, name="q_proj")(q_in).reshape(
            b, nq, self.num_heads, hd)
        kk = nn.Dense(d, dtype=self.dtype, name="k_proj")(k_in).reshape(
            b, n, self.num_heads, hd)
        vv = nn.Dense(d, dtype=self.dtype, name="v_proj")(kv).reshape(
            b, n, self.num_heads, hd)
        out = scaled_dot_product_attention(qq, kk, vv).reshape(b, nq, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class QwenVisionTransformer(nn.Module):
    """Full visual tower, laid out to mirror the checkpoint tree
    (`visual.{conv1, positional_embedding, ln_pre, resblocks_N, attn_pool,
    ln_post, proj}`): ViT-bigG trunk (conv patch embed — no bias, no cls —
    + interpolated abs pos + ln_pre + pre-LN blocks, qwen_vit.py:267-312)
    then resampler -> ln_post -> @ proj (visual.py:141-193)."""

    config: QwenVisionConfig
    num_queries: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="conv1")(pixel_values)  # NHWC in
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.width)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.width ** -0.5),
                         (cfg.pos_embed_size ** 2, cfg.width))
        x = x + get_abs_pos(pos, gh * gw).astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = VisualAttentionBlock(cfg.width, cfg.heads, cfg.mlp_ratio,
                                     dtype=self.dtype, name=f"resblocks_{i}")(x)
        x = Resampler(num_queries=self.num_queries, out_dim=cfg.output_dim,
                      num_heads=max(cfg.output_dim // 128, 1),
                      dtype=self.dtype, name="attn_pool")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_post")(x)
        proj = self.param("proj",
                          nn.initializers.normal(cfg.output_dim ** -0.5),
                          (cfg.output_dim, cfg.output_dim))
        return x @ proj.astype(x.dtype)
