"""Kandinsky 3 UNet (reference ppdiffusers/models/unet_kandi3.py): big
BigGAN-deep-style UNet where EVERY norm is a time-conditioned GroupNorm
(FiLM), resnet blocks are 1-3-3-1 bottlenecks at compression 2 with
resolution changes inside the block, and attention levels cross-attend to
Flan-T5-XXL states. NHWC throughout."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .embeddings import TimestepEmbedding


@dataclasses.dataclass
class Kandinsky3UNetConfig(BaseConfig):
    model_type = "kandinsky3-unet"
    in_channels: int = 4
    time_embedding_dim: int = 1536
    groups: int = 32
    attention_head_dim: int = 64
    layers_per_block: int = 3
    block_out_channels: Tuple[int, ...] = (384, 768, 1536, 3072)
    cross_attention_dim: int = 4096
    encoder_hid_dim: int = 4096
    add_cross_attention: Tuple[bool, ...] = (False, True, True, True)
    add_self_attention: Tuple[bool, ...] = (False, True, True, True)
    expansion_ratio: int = 4
    compression_ratio: int = 2


class CondGroupNorm(nn.Module):
    """No-affine GroupNorm modulated by the time embedding (unet_kandi3.py
    Kandinsky3ConditionalGroupNorm)."""

    groups: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        c = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(self.groups, c), use_bias=False,
                         use_scale=False, dtype=self.dtype, name="norm")(x)
        mod = nn.Dense(2 * c, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="context_mlp")(nn.silu(context))
        scale, shift = jnp.split(mod[:, None, None, :], 2, axis=-1)
        return h * (scale + 1.0) + shift


class K3Attention(nn.Module):
    """to_q/to_k/to_v/to_out (all bias-free)."""

    channels: int
    context_dim: int
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, context_mask=None):
        nh = self.channels // self.head_dim
        b, s = x.shape[:2]
        sk = context.shape[1]
        q = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="to_v")(context)
        bias = None
        if context_mask is not None:
            bias = jnp.where(context_mask[:, None, None, :].astype(bool), 0.0,
                             -1e9).astype(jnp.float32)
        out = scaled_dot_product_attention(
            q.reshape(b, s, nh, self.head_dim), k.reshape(b, sk, nh, self.head_dim),
            v.reshape(b, sk, nh, self.head_dim), bias=bias).reshape(b, s, self.channels)
        return nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class K3Block(nn.Module):
    out_channels: int
    kernel: int = 3
    groups: int = 32
    up: Optional[bool] = None  # True: 2x up before conv; False: 2x down after
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        x = CondGroupNorm(self.groups, temb.shape[-1], dtype=self.dtype,
                          name="group_norm")(x, temb)
        x = nn.silu(x)
        if self.up is True:
            x = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="up_sample")(x)
        p = int(self.kernel > 1)
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), dtype=self.dtype, name="projection")(x)
        if self.up is False:
            x = nn.Conv(self.out_channels, (2, 2), strides=(2, 2),
                        dtype=self.dtype, name="down_sample")(x)
        return x


class K3ResNetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    compression: int = 2
    up_resolutions: Tuple[Optional[bool], ...] = (None, None, None, None)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        cin = x.shape[-1]
        hidden = max(cin, self.out_channels) // self.compression
        chans = [hidden, hidden, hidden, self.out_channels]
        kernels = [1, 3, 3, 1]
        out = x
        for i, (ch, k, up) in enumerate(zip(chans, kernels, self.up_resolutions)):
            out = K3Block(ch, k, self.groups, up, dtype=self.dtype,
                          name=f"resnet_blocks_{i}")(out, temb)
        if True in self.up_resolutions:
            x = nn.ConvTranspose(cin, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 name="shortcut_up_sample")(x)
        if cin != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut_projection")(x)
        if False in self.up_resolutions:
            x = nn.Conv(self.out_channels, (2, 2), strides=(2, 2),
                        dtype=self.dtype, name="shortcut_down_sample")(x)
        return x + out


class K3AttentionBlock(nn.Module):
    context_dim: Optional[int] = None  # None => self-attention
    groups: int = 32
    head_dim: int = 64
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context=None, context_mask=None):
        b, h, w, c = x.shape
        out = CondGroupNorm(self.groups, temb.shape[-1], dtype=self.dtype,
                            name="in_norm")(x, temb)
        tokens = out.reshape(b, h * w, c)
        ctx = context if self.context_dim is not None else tokens
        attn = K3Attention(c, self.context_dim or c, self.head_dim,
                           dtype=self.dtype, name="attention")(
            tokens, ctx, context_mask if self.context_dim is not None else None)
        x = x + attn.reshape(b, h, w, c)
        out = CondGroupNorm(self.groups, temb.shape[-1], dtype=self.dtype,
                            name="out_norm")(x, temb)
        ff = nn.Conv(c * self.expansion, (1, 1), use_bias=False, dtype=self.dtype,
                     name="ff_0")(out)
        ff = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                     name="ff_2")(nn.silu(ff))
        return x + ff


class Kandinsky3UNetModule(nn.Module):
    config: Kandinsky3UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states=None,
                 encoder_attention_mask=None):
        cfg = self.config
        b = sample.shape[0]
        init_ch = cfg.block_out_channels[0] // 2
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        # SinusoidalPosEmb (flip_sin_to_cos=False, downscale_freq_shift=1)
        half = init_ch // 2
        emb = math.log(10000) / (half - 1)
        emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        emb = timestep.astype(jnp.float32)[:, None] * emb[None]
        temb_in = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        temb = TimestepEmbedding(cfg.time_embedding_dim, dtype=self.dtype,
                                 name="time_embedding")(temb_in.astype(self.dtype))

        context = None
        if encoder_hidden_states is not None:
            # encoder_hid_proj: Linear (no bias) + LayerNorm
            context = nn.Dense(cfg.cross_attention_dim, use_bias=False,
                               dtype=self.dtype,
                               name="encoder_hid_proj")(encoder_hidden_states)
            context = nn.LayerNorm(dtype=self.dtype, name="encoder_hid_norm")(context)
            # attention pooling of the context into the time embedding
            pooled = K3Attention(cfg.time_embedding_dim, cfg.cross_attention_dim,
                                 cfg.attention_head_dim, dtype=self.dtype,
                                 name="add_time_condition")(
                jnp.mean(context, axis=1, keepdims=True), context,
                encoder_attention_mask)
            temb = temb + pooled[:, 0]

        x = nn.Conv(init_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(sample)

        dims = [init_ch] + list(cfg.block_out_channels)
        n_levels = len(cfg.block_out_channels)
        skips = []
        for lvl in range(n_levels):
            out_dim = dims[lvl + 1]
            has_ctx = cfg.add_cross_attention[lvl]
            has_self = cfg.add_self_attention[lvl]
            down = lvl != n_levels - 1
            if has_self:
                x = K3AttentionBlock(None, cfg.groups, cfg.attention_head_dim,
                                     cfg.expansion_ratio, dtype=self.dtype,
                                     name=f"down_{lvl}_self")(x, temb)
            for j in range(cfg.layers_per_block):
                last = j == cfg.layers_per_block - 1
                ups = (None, None, False if (down and last) else None, None)
                x = K3ResNetBlock(out_dim, cfg.groups, cfg.compression_ratio,
                                  dtype=self.dtype,
                                  name=f"down_{lvl}_res_in_{j}")(x, temb)
                if has_ctx:
                    x = K3AttentionBlock(cfg.cross_attention_dim, cfg.groups,
                                         cfg.attention_head_dim,
                                         cfg.expansion_ratio, dtype=self.dtype,
                                         name=f"down_{lvl}_attn_{j}")(
                        x, temb, context, encoder_attention_mask)
                x = K3ResNetBlock(out_dim, cfg.groups, cfg.compression_ratio,
                                  up_resolutions=ups, dtype=self.dtype,
                                  name=f"down_{lvl}_res_out_{j}")(x, temb)
            if down:
                skips.append(x)

        for ulvl, lvl in enumerate(reversed(range(n_levels))):
            out_dim = dims[lvl]  # up path returns to the previous width
            in_dim = dims[lvl + 1]
            has_ctx = cfg.add_cross_attention[lvl]
            has_self = cfg.add_self_attention[lvl]
            up = ulvl != 0
            if up:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            for j in range(cfg.layers_per_block):
                ups = (None, True if (up and j == 0) else None, None, None)
                ch = in_dim if j < cfg.layers_per_block - 1 else out_dim
                x = K3ResNetBlock(in_dim, cfg.groups, cfg.compression_ratio,
                                  up_resolutions=ups, dtype=self.dtype,
                                  name=f"up_{ulvl}_res_in_{j}")(x, temb)
                if has_ctx:
                    x = K3AttentionBlock(cfg.cross_attention_dim, cfg.groups,
                                         cfg.attention_head_dim,
                                         cfg.expansion_ratio, dtype=self.dtype,
                                         name=f"up_{ulvl}_attn_{j}")(
                        x, temb, context, encoder_attention_mask)
                x = K3ResNetBlock(ch, cfg.groups, cfg.compression_ratio,
                                  dtype=self.dtype,
                                  name=f"up_{ulvl}_res_out_{j}")(x, temb)
            if has_self:
                x = K3AttentionBlock(None, cfg.groups, cfg.attention_head_dim,
                                     cfg.expansion_ratio, dtype=self.dtype,
                                     name=f"up_{ulvl}_self")(x, temb)

        x = nn.GroupNorm(num_groups=cfg.groups, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class Kandinsky3UNet(PretrainedModel):
    config_class = Kandinsky3UNetConfig
    module_class = Kandinsky3UNetModule

    @classmethod
    def example_inputs(cls, config):
        r = 2 ** (len(config.block_out_channels) - 1)
        return ((jnp.zeros((1, r * 2, r * 2, config.in_channels)),
                 jnp.zeros((1,)), jnp.zeros((1, 8, config.encoder_hid_dim))), {})
