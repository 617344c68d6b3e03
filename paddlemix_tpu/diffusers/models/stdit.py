"""Open-Sora STDiT2: spatial-temporal DiT for text-to-video.

Rebuild of the reference's examples/Open-Sora/models/stdit/stdit2.py
(STDiT2Block:39, STDiT2:241): DiT blocks whose token axis factors into
(T, S=H*W) — spatial attention runs per frame, temporal attention per site
(separate adaLN gates: a 6-way scale/shift table driven by the timestep for
the spatial+MLP branches, a 3-way temporal table), text enters via
multi-head cross attention, and size/fps conditioning adds to the timestep
embedding. Compactness deltas (documented): the x_mask image-conditioning
select and dynamic-resolution bucketing are omitted; shapes are static like
everything else here.

TPU notes: the (B, T, S, C) factorization is pure reshapes; attention rides
the flash kernel; the whole denoise loop jits."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .embeddings import TimestepEmbedding, Timesteps, get_2d_sincos_pos_embed


@dataclasses.dataclass
class STDiT2Config(BaseConfig):
    model_type = "stdit2"
    input_size: Tuple[int, ...] = (16, 32, 32)  # (T, H, W) latent
    in_channels: int = 4
    patch_size: int = 2          # spatial; temporal patch = 1
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    caption_channels: int = 4096
    model_max_length: int = 200
    # per-block remat (reference recompute)
    gradient_checkpointing: bool = False


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


class _Attn(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None):
        c = x.shape[-1]
        hd = c // self.num_heads
        b, n = x.shape[:2]
        kv_src = x if kv is None else kv
        m = kv_src.shape[1]
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k")(kv_src)
        v = nn.Dense(c, dtype=self.dtype, name="v")(kv_src)
        out = scaled_dot_product_attention(
            q.reshape(b, n, self.num_heads, hd),
            k.reshape(b, m, self.num_heads, hd),
            v.reshape(b, m, self.num_heads, hd)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class STDiT2Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, t6, t3, T, S):
        b, n, c = x.shape
        table6 = self.param("scale_shift_table", nn.initializers.normal(
            1.0 / c ** 0.5), (6, c))
        table3 = self.param("scale_shift_table_temporal",
                            nn.initializers.normal(1.0 / c ** 0.5), (3, c))
        mods6 = table6[None].astype(x.dtype) + t6.reshape(b, 6, c)
        mods3 = table3[None].astype(x.dtype) + t3.reshape(b, 3, c)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
            mods6[:, i][:, None] for i in range(6)]
        sh_t, sc_t, g_t = [mods3[:, i][:, None] for i in range(3)]

        # spatial attention per frame
        h = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                   dtype=self.dtype, name="norm1")(x),
                      sh_msa, sc_msa)
        hs = h.reshape(b * T, S, c)
        hs = _Attn(self.num_heads, dtype=self.dtype, name="attn")(hs)
        x = x + g_msa * hs.reshape(b, n, c)

        # temporal attention per site
        h = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                   dtype=self.dtype, name="norm_temp")(x),
                      sh_t, sc_t)
        ht = h.reshape(b, T, S, c).transpose(0, 2, 1, 3).reshape(b * S, T, c)
        ht = _Attn(self.num_heads, dtype=self.dtype, name="attn_temp")(ht)
        ht = ht.reshape(b, S, T, c).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + g_t * ht

        # text cross attention
        x = x + _Attn(self.num_heads, dtype=self.dtype,
                      name="cross_attn")(x, y)

        # MLP
        h = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                   dtype=self.dtype, name="norm2")(x),
                      sh_mlp, sc_mlp)
        h = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(h)
        return x + g_mlp * h


class STDiT2Module(nn.Module):
    config: STDiT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep, y, fps=None):
        """x: (B, T, H, W, C) latents; y: (B, N_tok, caption_channels)."""
        cfg = self.config
        d = cfg.hidden_size
        p = cfg.patch_size
        b, T, H, W, _ = x.shape
        hh, ww = H // p, W // p
        S = hh * ww

        # patchify (spatial p, temporal 1)
        x = x.reshape(b, T, hh, p, ww, p, cfg.in_channels)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, T * S,
                                                     p * p * cfg.in_channels)
        x = nn.Dense(d, dtype=self.dtype, name="x_embedder")(x)

        pos = get_2d_sincos_pos_embed(d, hh, ww)  # (S, d)
        pos_t = get_2d_sincos_pos_embed(d, T, 1)  # (T, d) temporal
        x = x.reshape(b, T, S, d)
        x = x + jnp.asarray(pos)[None, None].astype(x.dtype)
        x = x + jnp.asarray(pos_t)[None, :, None].astype(x.dtype)
        x = x.reshape(b, T * S, d)

        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t_emb = Timesteps(256, True, 0.0)(timestep)
        t = TimestepEmbedding(d, dtype=self.dtype,
                              name="t_embedder")(t_emb.astype(self.dtype))
        if fps is not None:
            f_emb = Timesteps(256, True, 0.0)(jnp.broadcast_to(fps, (b,)))
            t = t + TimestepEmbedding(d, dtype=self.dtype,
                                      name="fps_embedder")(f_emb.astype(self.dtype))
        t6 = nn.Dense(6 * d, dtype=self.dtype, name="t_block")(nn.silu(t))
        t3 = nn.Dense(3 * d, dtype=self.dtype, name="t_block_temp")(nn.silu(t))

        y = nn.Dense(d, dtype=self.dtype, name="y_embedder")(y)

        for i in range(cfg.depth):
            blk = STDiT2Block(cfg.num_heads, cfg.mlp_ratio, dtype=self.dtype,
                              name=f"blocks_{i}")
            if cfg.gradient_checkpointing:
                x = nn.remat(lambda m, a, yy, a6, a3: m(a, yy, a6, a3, T, S),
                             prevent_cse=False)(blk, x, y, t6, t3)
            else:
                x = blk(x, y, t6, t3, T, S)

        # final layer: adaLN + unpatchify, learned-sigma output (2x channels)
        tableF = self.param("final_scale_shift", nn.initializers.normal(
            1.0 / d ** 0.5), (2, d))
        modsF = tableF[None].astype(x.dtype) + \
            nn.Dense(2 * d, dtype=self.dtype,
                     name="t_final")(nn.silu(t)).reshape(b, 2, d)
        x = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                   dtype=self.dtype, name="final_norm")(x),
                      modsF[:, 0][:, None], modsF[:, 1][:, None])
        x = nn.Dense(p * p * 2 * cfg.in_channels, dtype=self.dtype,
                     name="final_proj")(x)
        x = x.reshape(b, T, hh, ww, p, p, 2 * cfg.in_channels)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, T, H, W,
                                                     2 * cfg.in_channels)
        return x


class STDiT2Model(PretrainedModel):
    config_class = STDiT2Config
    module_class = STDiT2Module

    @classmethod
    def example_inputs(cls, config):
        t, h, w = 2, 8, 8
        return (jnp.zeros((1, t, h, w, config.in_channels)), jnp.asarray(0),
                jnp.zeros((1, 8, config.caption_channels))), {"fps": jnp.asarray(8.0)}
