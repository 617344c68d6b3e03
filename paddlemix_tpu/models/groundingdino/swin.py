"""Swin Transformer backbone (GroundingDINO's image backbone).

Rebuild of the reference swin (paddlemix/models/groundingdino/backbone/
swin_transformer.py): shifted-window attention with relative position bias,
patch merging between stages, multi-scale feature output. Static shapes: the
window partition/shift are reshapes + rolls, all XLA-friendly."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class SwinConfig(BaseConfig):
    model_type = "swin"
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)


def window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(windows, w, h, wd):
    b = windows.shape[0] // (h * wd // w // w)
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (num_windows*B, w*w, C); mask: (num_windows, w*w, w*w) or None."""
        bw, n, c = x.shape
        w = self.window_size
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(bw, n, 3 * self.num_heads, hd), 3, axis=2)

        rel_table = self.param("relative_position_bias_table",
                               nn.initializers.normal(0.02),
                               ((2 * w - 1) * (2 * w - 1), self.num_heads))
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.transpose(1, 2, 0) + np.asarray([w - 1, w - 1])
        idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
        bias = rel_table[jnp.asarray(idx.reshape(-1))].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # (1, H, n, n)
        if mask is not None:
            nw = mask.shape[0]
            bias = bias + jnp.tile(mask[:, None].astype(jnp.float32), (bw // nw, 1, 1, 1))
        out = scaled_dot_product_attention(q, k, v, bias=bias, impl="math")
        out = out.reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, wd, c = x.shape
        w = self.window_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        pad_h = (-h) % w
        pad_w = (-wd) % w
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, wd + pad_w
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            # attention mask separating rolled-together regions
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mask_windows = window_partition(jnp.asarray(img_mask), w)[:, :, 0]
            attn_mask = jnp.where(
                mask_windows[:, None, :] == mask_windows[:, :, None], 0.0, -1e9)
        else:
            attn_mask = None
        windows = window_partition(x, w)
        attn = WindowAttention(c, self.num_heads, w, dtype=self.dtype,
                               name="attn")(windows, attn_mask)
        x = window_reverse(attn, w, hp, wp)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :h, :wd]
        x = shortcut + x
        hmlp = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        hmlp = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(hmlp)
        hmlp = nn.gelu(hmlp, approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(hmlp)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinBackbone(nn.Module):
    config: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(pixel_values)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        outs = []
        dim = cfg.embed_dim
        for si, depth in enumerate(cfg.depths):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(dim, cfg.num_heads[si], cfg.window_size, shift,
                              cfg.mlp_ratio, dtype=self.dtype,
                              name=f"stage{si}_block{bi}")(x)
            if si in cfg.out_indices:
                outs.append(nn.LayerNorm(dtype=self.dtype, name=f"out_norm{si}")(x))
            if si < len(cfg.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{si}")(x)
                dim *= 2
        return outs  # multi-scale NHWC features
