"""Spatio-temporal UNet for Stable Video Diffusion.

Rebuild of the reference's SVD stack
(ppdiffusers/ppdiffusers/models/unet_spatio_temporal_condition.py,
unet_3d_blocks.py SpatioTemporal blocks, resnet.py TemporalResnetBlock /
SpatioTemporalResBlock / AlphaBlender:1152-1420, transformer_temporal.py
TransformerSpatioTemporalModel:204, attention.py
TemporalBasicTransformerBlock:493) as TPU-native flax:

- channels-last everywhere: video tensors are (B, F, H, W, C); spatial layers
  see (B*F, H, W, C) (a free reshape), temporal attention sees (B*HW, F, C).
- temporal convs are plain nn.Conv with a (3, 1, 1) kernel on the 5-D
  (B, F, H, W, C) array — XLA lowers them onto the MXU like any conv.
- every frame count is static, so the whole denoise loop jits.
Param names track the torch layout for checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .attention import BasicTransformerBlock, CrossAttention, GEGLUFeedForward
from .embeddings import TimestepEmbedding, Timesteps
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mixing factor (reference resnet.py:1333)."""

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only_indicator=None):
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, jnp.float32)
        else:
            mix = self.param("mix_factor", nn.initializers.constant(self.alpha), (1,))
            alpha = nn.sigmoid(mix.astype(jnp.float32))
        if self.merge_strategy == "learned_with_images":
            # image rows use pure spatial features; video rows the learned mix
            alpha = jnp.where(image_only_indicator.astype(bool),
                              jnp.ones((1, 1), jnp.float32), alpha[..., None])
            if x_spatial.ndim == 5:    # (B, F, H, W, C)
                alpha = alpha[:, :, None, None, None]
            elif x_spatial.ndim == 3:  # (B*F, S, C)
                alpha = alpha.reshape(-1)[:, None, None]
            else:
                raise ValueError(f"unexpected ndim {x_spatial.ndim}")
        alpha = alpha.astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class TemporalResnetBlock(nn.Module):
    """(B, F, H, W, C) resnet with (3,1,1) temporal convs (reference
    resnet.py:1152)."""

    out_channels: Optional[int] = None
    temb: bool = True
    eps: float = 1e-6
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        out_ch = self.out_channels or x.shape[-1]
        pad = ((1, 1), (0, 0), (0, 0))
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.Conv(out_ch, (3, 1, 1), padding=pad, dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        if self.temb and temb is not None:
            # temb: (B, F, D) -> (B, F, 1, 1, out)
            t = nn.Dense(out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, :, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.Conv(out_ch, (3, 1, 1), padding=pad, dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResnetBlock2D + temporal resnet + AlphaBlender (reference
    resnet.py:1245 VideoResBlock). Input (B*F, H, W, C)."""

    out_channels: Optional[int] = None
    num_frames: int = 1
    eps: float = 1e-6
    temporal_eps: Optional[float] = None
    merge_factor: float = 0.5
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False
    temb: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, image_only_indicator=None):
        f = self.num_frames
        x = ResnetBlock2D(self.out_channels, groups=self.groups, eps=self.eps,
                          dtype=self.dtype, name="spatial_res_block")(x, temb)
        bf, hh, ww, c = x.shape
        b = bf // f
        vid = x.reshape(b, f, hh, ww, c)
        temb_f = temb.reshape(b, f, -1) if (self.temb and temb is not None) else None
        mixed = TemporalResnetBlock(
            c, temb=self.temb, eps=self.temporal_eps or self.eps,
            groups=self.groups, dtype=self.dtype,
            name="temporal_res_block")(vid, temb_f)
        out = AlphaBlender(
            self.merge_factor, self.merge_strategy,
            self.switch_spatial_to_temporal_mix, name="time_mixer")(
            vid, mixed, image_only_indicator)
        return out.reshape(bf, hh, ww, c)


class TemporalBasicTransformerBlock(nn.Module):
    """Attention over the frame axis (reference attention.py:493). Input
    (B*F, S, C); internally (B*S, F, C)."""

    num_heads: int
    head_dim: int
    num_frames: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, time_context=None):
        bf, s, c = hidden.shape
        f = self.num_frames
        b = bf // f
        h = hidden.reshape(b, f, s, c).transpose(0, 2, 1, 3).reshape(b * s, f, c)

        residual = h
        h = nn.LayerNorm(dtype=self.dtype, name="norm_in")(h)
        h = GEGLUFeedForward(dtype=self.dtype, name="ff_in")(h) + residual

        n = nn.LayerNorm(dtype=self.dtype, name="norm1")(h)
        h = h + CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                               name="attn1")(n)
        if time_context is not None:
            n = nn.LayerNorm(dtype=self.dtype, name="norm2")(h)
            h = h + CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                                   name="attn2")(n, time_context)
        n = nn.LayerNorm(dtype=self.dtype, name="norm3")(h)
        h = h + GEGLUFeedForward(dtype=self.dtype, name="ff")(n)
        return h.reshape(b, s, f, c).transpose(0, 2, 1, 3).reshape(bf, s, c)


class TransformerSpatioTemporalModel(nn.Module):
    """Spatial transformer blocks interleaved with temporal blocks, mixed by
    AlphaBlender (reference transformer_temporal.py:204)."""

    num_heads: int
    head_dim: int
    num_layers: int = 1
    num_frames: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, image_only_indicator):
        bf, hh, ww, c = x.shape
        f = self.num_frames
        b = bf // f
        inner = self.num_heads * self.head_dim
        residual = x

        # temporal cross-attn context: first frame's context per batch row
        # (reference time_context_first_timestep), one token per spatial site
        time_context = context.reshape(b, f, *context.shape[1:])[:, 0]  # (B, S, D)
        time_context = jnp.repeat(time_context, hh * ww, axis=0)        # (B*HW, S, D)

        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        x = x.reshape(bf, hh * ww, c)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        # frame-index positional embedding for the temporal blocks
        frames = jnp.tile(jnp.arange(f), (b,))
        t_emb = Timesteps(c, True, 0.0)(frames).astype(x.dtype)
        emb = TimestepEmbedding(c * 4, out_dim=c, dtype=self.dtype,
                                name="time_pos_embed")(t_emb)[:, None, :]

        for i in range(self.num_layers):
            x = BasicTransformerBlock(self.num_heads, self.head_dim,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(x, context)
            mix = TemporalBasicTransformerBlock(
                self.num_heads, self.head_dim, f, dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}")(x + emb, time_context)
            x = AlphaBlender(0.5, "learned_with_images", name="time_mixer")(
                x, mix, image_only_indicator)

        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(bf, hh, ww, c) + residual


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_frames: int
    add_downsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, image_only_indicator):
        outs = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, self.num_frames,
                                       eps=1e-5, groups=self.groups,
                                       dtype=self.dtype, name=f"resnets_{i}")(
                x, temb, image_only_indicator)
            outs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outs.append(x)
        return x, outs


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    tf_layers: int
    num_frames: int
    add_downsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, image_only_indicator):
        outs = []
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, self.num_frames,
                                       eps=1e-6, groups=self.groups,
                                       dtype=self.dtype, name=f"resnets_{i}")(
                x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, self.tf_layers, self.num_frames,
                groups=self.groups, dtype=self.dtype, name=f"attentions_{i}")(
                x, context, image_only_indicator)
            outs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outs.append(x)
        return x, outs


class UNetMidBlockSpatioTemporal(nn.Module):
    channels: int
    num_heads: int
    tf_layers: int
    num_frames: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, image_only_indicator):
        head_dim = self.channels // self.num_heads
        x = SpatioTemporalResBlock(self.channels, self.num_frames, eps=1e-5,
                                   groups=self.groups, dtype=self.dtype,
                                   name="resnets_0")(
            x, temb, image_only_indicator)
        x = TransformerSpatioTemporalModel(
            self.num_heads, head_dim, self.tf_layers, self.num_frames,
            groups=self.groups, dtype=self.dtype, name="attentions_0")(
            x, context, image_only_indicator)
        x = SpatioTemporalResBlock(self.channels, self.num_frames, eps=1e-5,
                                   groups=self.groups, dtype=self.dtype,
                                   name="resnets_1")(
            x, temb, image_only_indicator)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_frames: int
    add_upsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, image_only_indicator):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = SpatioTemporalResBlock(self.out_channels, self.num_frames,
                                       eps=1e-5, groups=self.groups,
                                       dtype=self.dtype, name=f"resnets_{i}")(
                x, temb, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    tf_layers: int
    num_frames: int
    add_upsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, image_only_indicator):
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = SpatioTemporalResBlock(self.out_channels, self.num_frames,
                                       eps=1e-6, groups=self.groups,
                                       dtype=self.dtype, name=f"resnets_{i}")(
                x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, self.tf_layers, self.num_frames,
                groups=self.groups, dtype=self.dtype, name=f"attentions_{i}")(
                x, context, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


@dataclasses.dataclass
class UNetSpatioTemporalConditionConfig(BaseConfig):
    model_type = "unet_spatio_temporal_condition"
    sample_size: Optional[int] = None
    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (5, 10, 10, 20)
    num_frames: int = 25
    norm_num_groups: int = 32  # reference hardcodes 32

    def _per_block(self, v):
        n = len(self.block_out_channels)
        return (v,) * n if isinstance(v, int) else tuple(v)


class UNetSpatioTemporalConditionModule(nn.Module):
    config: UNetSpatioTemporalConditionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states, added_time_ids,
                 image_only_indicator=None):
        """sample: (B, F, H, W, C_in); encoder_hidden_states: (B, S, D);
        added_time_ids: (B, 3) = (fps, motion_bucket_id, noise_aug)."""
        cfg = self.config
        b, f, hh, ww, _ = sample.shape
        heads = cfg._per_block(cfg.num_attention_heads)
        tf_layers = cfg._per_block(cfg.transformer_layers_per_block)

        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t_emb = Timesteps(cfg.block_out_channels[0], True, 0.0)(timestep)
        emb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        add_embeds = Timesteps(cfg.addition_time_embed_dim, True, 0.0)(
            added_time_ids.reshape(-1)).reshape(b, -1)
        emb = emb + TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype,
            name="add_embedding")(add_embeds.astype(self.dtype))

        # fold frames into the batch; broadcast conditioning per frame
        sample = sample.reshape(b * f, hh, ww, sample.shape[-1])
        emb = jnp.repeat(emb, f, axis=0)
        context = jnp.repeat(encoder_hidden_states, f, axis=0)
        if image_only_indicator is None:
            image_only_indicator = jnp.zeros((b, f), jnp.float32)

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="conv_in")(sample)

        skips = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            last = i == len(cfg.down_block_types) - 1
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                sample, outs = CrossAttnDownBlockSpatioTemporal(
                    ch, cfg.layers_per_block, heads[i], tf_layers[i], f,
                    add_downsample=not last, groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}")(sample, emb, context,
                                             image_only_indicator)
            else:
                sample, outs = DownBlockSpatioTemporal(
                    ch, cfg.layers_per_block, f, add_downsample=not last,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"down_blocks_{i}")(
                    sample, emb, image_only_indicator)
            skips.extend(outs)

        sample = UNetMidBlockSpatioTemporal(
            cfg.block_out_channels[-1], heads[-1], tf_layers[-1], f,
            groups=cfg.norm_num_groups, dtype=self.dtype,
            name="mid_block")(sample, emb, context, image_only_indicator)

        for i, block_type in enumerate(cfg.up_block_types):
            rev = list(reversed(cfg.block_out_channels))
            ch = rev[i]
            j = len(cfg.block_out_channels) - 1 - i
            last = i == len(cfg.up_block_types) - 1
            n_layers = cfg.layers_per_block + 1
            block_skips = [skips.pop() for _ in range(n_layers)][::-1]
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                sample = CrossAttnUpBlockSpatioTemporal(
                    ch, n_layers, heads[j], tf_layers[j], f,
                    add_upsample=not last, groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}")(sample, block_skips, emb, context,
                                           image_only_indicator)
            else:
                sample = UpBlockSpatioTemporal(
                    ch, n_layers, f, add_upsample=not last,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"up_blocks_{i}")(sample, block_skips, emb,
                                           image_only_indicator)

        sample = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                              dtype=self.dtype, name="conv_norm_out")(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_out")(nn.silu(sample))
        return sample.reshape(b, f, hh, ww, cfg.out_channels)


class UNetSpatioTemporalConditionModel(PretrainedModel):
    config_class = UNetSpatioTemporalConditionConfig
    module_class = UNetSpatioTemporalConditionModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 2, 16, 16, config.in_channels)), jnp.asarray(0),
                jnp.zeros((1, 1, config.cross_attention_dim)),
                jnp.zeros((1, 3))), {}
