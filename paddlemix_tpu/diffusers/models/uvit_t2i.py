"""U-ViT text-to-image diffusion backbone.

Rebuild of the reference's MS-COCO U-ViT example model
(ppdiffusers/examples/text_to_image_mscoco_uvit/ldm/uvit_t2i.py:265-430):
latent patches + one sinusoidal time token + 77 projected CLIP context
tokens run through a U-shaped ViT — depth//2 in-blocks (skips saved),
a mid block, depth//2 out-blocks each fusing its skip via a 2D->D linear
— then LN, per-patch decode, unpatchify, 3x3 conv.

TPU-first: NHWC latents, patchify/unpatchify as reshapes (no conv for the
embed — a patch_size-stride conv and a reshape+matmul are the same matmul,
the reshape form fuses better), parameter-free LayerNorms exactly like the
reference (elementwise_affine=False), jax.checkpoint-compatible blocks."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class UViTT2IConfig(BaseConfig):
    model_type = "uvit_t2i"
    sample_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 4
    num_layers: int = 28
    num_attention_heads: int = 16
    attention_head_dim: int = 72
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    clip_dim: int = 768
    num_text_tokens: int = 77
    conv: bool = True

    @property
    def embed_dim(self):
        return self.num_attention_heads * self.attention_head_dim


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class UViTBlock(nn.Module):
    config: UViTT2IConfig
    skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        cfg = self.config
        d = cfg.embed_dim
        if self.skip:
            x = nn.Dense(d, dtype=self.dtype, name="skip_linear")(
                jnp.concatenate([x, skip], axis=-1))
        # parameter-free LNs (reference norm_layer(dim, weight_attr=False))
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        b, n, _ = h.shape
        qkv = nn.Dense(d * 3, use_bias=cfg.qkv_bias, dtype=self.dtype,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, n, cfg.num_attention_heads, cfg.attention_head_dim)
        att = scaled_dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape))
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(
            att.reshape(b, n, d))
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        h = nn.Dense(int(d * cfg.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x


class UViTT2IModule(nn.Module):
    config: UViTT2IConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, encoder_hidden_states):
        cfg = self.config
        p = cfg.patch_size
        d = cfg.embed_dim
        b, hh, ww, c = x.shape
        ph, pw = hh // p, ww // p
        # patchify + embed (reshape+matmul form of the reference's
        # stride-p conv patch_embed)
        patches = x.reshape(b, ph, p, pw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, ph * pw, p * p * c)
        tokens = nn.Dense(d, dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype))

        t = jnp.broadcast_to(jnp.asarray(timesteps, jnp.float32).reshape(-1),
                             (b,))
        time_token = timestep_embedding(t, d).astype(self.dtype)[:, None]
        context = nn.Dense(d, dtype=self.dtype, name="context_embed")(
            encoder_hidden_states.astype(self.dtype))
        seq = jnp.concatenate([time_token, context, tokens], axis=1)

        extras = 1 + cfg.num_text_tokens
        num_patches = (cfg.sample_size // p) ** 2
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, extras + num_patches, d))
        seq = seq + pos[:, : seq.shape[1]].astype(self.dtype)

        depth = cfg.num_layers
        skips = []
        for i in range(depth // 2):
            seq = UViTBlock(cfg, dtype=self.dtype, name=f"in_{i}")(seq)
            skips.append(seq)
        seq = UViTBlock(cfg, dtype=self.dtype, name="mid")(seq)
        for i in range(depth // 2):
            seq = UViTBlock(cfg, skip=True, dtype=self.dtype,
                            name=f"out_{i}")(seq, skips.pop())

        seq = nn.LayerNorm(use_bias=False, use_scale=False,
                           dtype=self.dtype)(seq)
        out = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype,
                       name="decoder_pred")(seq)
        out = out[:, extras:]
        out = out.reshape(b, ph, pw, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hh, ww, cfg.out_channels)
        if cfg.conv:
            out = nn.Conv(cfg.out_channels, (3, 3), padding="SAME",
                          dtype=self.dtype, name="final_layer")(out)
        return out


class UViTT2IModel(PretrainedModel):
    config_class = UViTT2IConfig
    module_class = UViTT2IModule

    @classmethod
    def example_inputs(cls, config):
        s = min(config.sample_size, 16)
        return ((jnp.zeros((1, s, s, config.in_channels)),
                 jnp.zeros((1,)),
                 jnp.zeros((1, config.num_text_tokens, config.clip_dim))), {})
