"""PixArt-α transformer (reference ppdiffusers/models/transformer_2d.py with
norm_type="ada_norm_single" + pipelines/pixart_alpha): DiT-style patch
transformer where ONE shared adaLN-single projection of the timestep feeds
every block through per-block learned scale_shift_tables, and text enters via
plain cross-attention over projected T5 caption embeddings."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .attention import CrossAttention, GEGLUFeedForward
from .embeddings import PatchEmbed2D, TimestepEmbedding, Timesteps


@dataclasses.dataclass
class PixArtConfig(BaseConfig):
    model_type = "pixart"
    sample_size: int = 64          # latent grid (512px / 8)
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8          # learned variance (eps + var)
    num_layers: int = 28
    num_attention_heads: int = 16
    attention_head_dim: int = 72
    caption_channels: int = 4096   # T5-XXL
    use_additional_conditions: bool = False  # 1024-model micro-conds
    # per-block remat (reference recompute)
    gradient_checkpointing: bool = False


class PixArtBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t6, context):
        d = self.num_heads * self.head_dim
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, d))
        mods = table[None].astype(x.dtype) + t6  # (B, 6, d)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            [mods[:, i][:, None, :] for i in range(6)]
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm1")(x)
        h = h * (1 + scale_msa) + shift_msa
        x = x + gate_msa * CrossAttention(self.num_heads, self.head_dim,
                                          dtype=self.dtype, name="attn1")(h)
        x = x + CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                               name="attn2")(x, context)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm3")(x)
        h = h * (1 + scale_mlp) + shift_mlp
        return x + gate_mlp * GEGLUFeedForward(dtype=self.dtype, name="ff")(h)


class PixArtModule(nn.Module):
    config: PixArtConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, encoder_hidden_states,
                 resolution=None, aspect_ratio=None):
        cfg = self.config
        d = cfg.num_attention_heads * cfg.attention_head_dim
        b = latents.shape[0]
        grid = latents.shape[1] // cfg.patch_size

        # PatchEmbed2D adds the 2D sincos positional embedding itself
        x = PatchEmbed2D(cfg.patch_size, d, dtype=self.dtype, name="pos_embed")(latents)

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))
        t = Timesteps(256)(timesteps)
        t = TimestepEmbedding(d, dtype=self.dtype, name="t_embedder")(
            t.astype(self.dtype))
        if cfg.use_additional_conditions and resolution is not None:
            r = Timesteps(256)(resolution.reshape(-1)).reshape(b, -1)
            a = Timesteps(256)(aspect_ratio.reshape(-1)).reshape(b, -1)
            t = t + TimestepEmbedding(d, dtype=self.dtype, name="res_embedder")(
                r.astype(self.dtype))
            t = t + TimestepEmbedding(d, dtype=self.dtype, name="ar_embedder")(
                a.astype(self.dtype))
        # adaLN-single: one 6*d projection shared by all blocks
        t6 = nn.Dense(6 * d, dtype=self.dtype, name="adaln_linear")(
            nn.silu(t)).reshape(b, 6, d)

        # caption projection: T5 dim -> d (linear-gelu-linear)
        c = nn.Dense(d, dtype=self.dtype, name="caption_fc1")(encoder_hidden_states)
        c = nn.gelu(c, approximate=True)
        c = nn.Dense(d, dtype=self.dtype, name="caption_fc2")(c)

        for i in range(cfg.num_layers):
            blk = PixArtBlock(cfg.num_attention_heads, cfg.attention_head_dim,
                              dtype=self.dtype, name=f"blocks_{i}")
            if cfg.gradient_checkpointing:
                x = nn.remat(lambda m, a, t_, cc: m(a, t_, cc),
                             prevent_cse=False)(blk, x, t6, c)
            else:
                x = blk(x, t6, c)

        # final adaLN (2-chunk) + unpatchify
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (2, d))
        mods = table[None].astype(x.dtype) + t[:, None, :]
        shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm_out")(x)
        x = x * (1 + scale) + shift
        p = cfg.patch_size
        x = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(b, grid, grid, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * p, grid * p,
                                                  cfg.out_channels)
        return x


class PixArtTransformer2DModel(PretrainedModel):
    config_class = PixArtConfig
    module_class = PixArtModule

    @classmethod
    def example_inputs(cls, config):
        s = config.patch_size * 2
        return ((jnp.zeros((1, s, s, config.in_channels)), jnp.zeros((1,)),
                 jnp.zeros((1, 8, config.caption_channels))), {})
