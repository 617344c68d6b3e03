"""Motion UNet: SD UNet + temporal attention (AnimateDiff / text-to-video).

Rebuild of the reference video UNets (ppdiffusers/ppdiffusers/models/
unet_motion_model.py, animatediff; unet_3d_condition for
text_to_video_synthesis): frames fold into the batch for all spatial layers
(the existing 2D blocks run unchanged) and unfold for temporal self-attention
over the frame axis after each block. Everything static-shape; the frame axis
is just a reshape on TPU."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .embeddings import TimestepEmbedding, Timesteps, get_1d_sincos_pos_embed
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D
from .unet_2d_condition import (
    CrossAttnDownBlock2D,
    CrossAttnUpBlock2D,
    DownBlock2D,
    UNet2DConditionConfig,
    UNetMidBlock2DCrossAttn,
    UpBlock2D,
)


@dataclasses.dataclass
class UNetMotionConfig(UNet2DConditionConfig):
    model_type = "unet_motion"
    num_frames: int = 16
    motion_num_heads: int = 8


class TemporalAttention(nn.Module):
    """Self-attention over the frame axis: (B*T, H, W, C) -> same."""

    num_heads: int
    num_frames: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        seq = x.reshape(b, t, h * w, c).transpose(0, 2, 1, 3).reshape(b * h * w, t, c)
        residual = seq
        seq = nn.LayerNorm(dtype=self.dtype, name="norm")(seq)
        pos = get_1d_sincos_pos_embed(c, jnp.arange(t))
        seq = seq + pos[None].astype(seq.dtype)
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(seq)
        q, k, v = jnp.split(qkv.reshape(b * h * w, t, 3 * self.num_heads, hd), 3, axis=2)
        attn = scaled_dot_product_attention(q, k, v, impl="math").reshape(b * h * w, t, c)
        seq = residual + nn.Dense(c, kernel_init=nn.initializers.zeros,
                                  dtype=self.dtype, name="proj")(attn)
        return seq.reshape(b, h * w, t, c).transpose(0, 2, 1, 3).reshape(bt, h, w, c)


class UNetMotionModule(nn.Module):
    config: UNetMotionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states):
        """sample: (B, T, H, W, C); context: (B, S, D) broadcast to frames."""
        cfg = self.config
        groups = cfg.norm_num_groups
        b, t, hh, ww, c = sample.shape
        sample = sample.reshape(b * t, hh, ww, c)
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t_rep = jnp.repeat(timestep, t)
        ctx = jnp.repeat(encoder_hidden_states, t, axis=0)

        time_embed_dim = cfg.block_out_channels[0] * 4
        t_emb = Timesteps(cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)(t_rep)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_in")(sample)
        heads = cfg.heads_per_block
        tf_layers = cfg.tf_layers_per_block
        skips = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            last = i == len(cfg.down_block_types) - 1
            if block_type == "CrossAttnDownBlock2D":
                sample, outs = CrossAttnDownBlock2D(
                    ch, cfg.layers_per_block, heads[i], tf_layers[i],
                    cfg.use_linear_projection, add_downsample=not last, groups=groups,
                    dtype=self.dtype, name=f"down_blocks_{i}")(sample, emb, ctx)
            else:
                sample, outs = DownBlock2D(ch, cfg.layers_per_block, add_downsample=not last,
                                           groups=groups, dtype=self.dtype,
                                           name=f"down_blocks_{i}")(sample, emb)
            sample = TemporalAttention(cfg.motion_num_heads, t, dtype=self.dtype,
                                       name=f"motion_down_{i}")(sample)
            outs = outs[:-1] + [sample] if outs else outs
            skips.extend(outs)

        sample = UNetMidBlock2DCrossAttn(
            cfg.block_out_channels[-1], heads[-1], tf_layers[-1],
            cfg.use_linear_projection, groups=groups, dtype=self.dtype,
            name="mid_block")(sample, emb, ctx)
        sample = TemporalAttention(cfg.motion_num_heads, t, dtype=self.dtype,
                                   name="motion_mid")(sample)

        for i, block_type in enumerate(cfg.up_block_types):
            rev = list(reversed(cfg.block_out_channels))
            ch = rev[i]
            j = len(cfg.block_out_channels) - 1 - i
            last = i == len(cfg.up_block_types) - 1
            n_layers = cfg.layers_per_block + 1
            block_skips = [skips.pop() for _ in range(n_layers)][::-1]
            if block_type == "CrossAttnUpBlock2D":
                sample = CrossAttnUpBlock2D(
                    ch, n_layers, heads[j], tf_layers[j], cfg.use_linear_projection,
                    add_upsample=not last, groups=groups, dtype=self.dtype,
                    name=f"up_blocks_{i}")(sample, list(block_skips), emb, ctx)
            else:
                sample = UpBlock2D(ch, n_layers, add_upsample=not last, groups=groups,
                                   dtype=self.dtype, name=f"up_blocks_{i}")(
                    sample, list(block_skips), emb)
            sample = TemporalAttention(cfg.motion_num_heads, t, dtype=self.dtype,
                                       name=f"motion_up_{i}")(sample)

        sample = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype,
                              name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_out")(sample)
        return sample.reshape(b, t, hh, ww, cfg.out_channels)


class UNetMotionModel(PretrainedModel):
    config_class = UNetMotionConfig
    module_class = UNetMotionModule

    @classmethod
    def example_inputs(cls, config):
        s = 16
        ctx_dim = config.cross_attention_dim if isinstance(config.cross_attention_dim, int) \
            else config.cross_attention_dim[0]
        return (jnp.zeros((1, min(config.num_frames, 4), s, s, config.in_channels)),
                jnp.asarray(0), jnp.zeros((1, 8, ctx_dim))), {}
