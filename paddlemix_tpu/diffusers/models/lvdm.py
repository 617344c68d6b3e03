"""LVDM: latent video diffusion with a TRUE 3-D conv stack.

Rebuild of the reference's LVDM family (models/lvdm_vae.py +
lvdm_aemodules3d.py 3-D autoencoder with temporal downsampling;
lvdm_unet_3d.py UNet with factored space-time convs and spatial/temporal
attention; consumed by pipelines/lvdm). Distinct from the SVD spatio-temporal
stack: here the VAE itself compresses TIME (videos encode to (T/ts, H/8, W/8)
latents) and the UNet runs 3-D throughout.

TPU design: channels-last (B, T, H, W, C); factored (1,3,3)+(3,1,1) convs
keep the MXU tiles dense; attention reshapes are free transposes; all frame
counts static."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .autoencoder_kl import DiagonalGaussian
from .embeddings import TimestepEmbedding, Timesteps


def _conv3(ch, k, name, dtype, strides=None):
    pad = tuple((d // 2, d // 2) for d in k)
    return nn.Conv(ch, k, strides=strides, padding=pad, dtype=dtype, name=name)


class ResBlock3D(nn.Module):
    """Factored space-time residual block: (1,3,3) spatial then (3,1,1)
    temporal conv (reference lvdm SamePadConv3d resblocks)."""

    out_channels: int
    groups: int = 32
    temb: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        out_ch = self.out_channels
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm1")(x)
        h = _conv3(out_ch, (1, 3, 3), "conv_spatial", self.dtype)(nn.silu(h))
        if self.temb and temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm2")(h)
        h = _conv3(out_ch, (3, 1, 1), "conv_temporal", self.dtype)(nn.silu(h))
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class STAttention(nn.Module):
    """Spatial attention per frame, then temporal attention per site
    (reference lvdm_attention_temporal.py STAttentionBlock)."""

    num_heads: int
    groups: int = 32
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def _attn(self, x, ctx, name):
        b, n, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{name}_q")(x)
        kv_src = x if ctx is None else ctx
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{name}_k")(kv_src)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{name}_v")(kv_src)
        m = kv_src.shape[1]
        out = scaled_dot_product_attention(
            q.reshape(b, n, self.num_heads, hd),
            k.reshape(b, m, self.num_heads, hd),
            v.reshape(b, m, self.num_heads, hd)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name=f"{name}_out")(out)

    @nn.compact
    def __call__(self, x, context=None):
        b, t, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        # spatial (+ optional text cross) attention per frame
        hs = h.reshape(b * t, hh * ww, c)
        ctx = None
        if context is not None:
            ctx = nn.Dense(c, use_bias=False, dtype=self.dtype,
                           name="context_proj")(context)
            ctx = jnp.repeat(ctx, t, axis=0)
        hs = self._attn(hs, ctx, "spatial")
        x = x + hs.reshape(b, t, hh, ww, c)
        # temporal attention per spatial site
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm_t")(x)
        ht = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, c)
        ht = self._attn(ht, None, "temporal")
        ht = ht.reshape(b, hh, ww, t, c).transpose(0, 3, 1, 2, 4)
        return x + ht


# --------------------------------------------------------------- 3-D VAE
@dataclasses.dataclass
class LVDMAutoencoderConfig(BaseConfig):
    model_type = "lvdm_autoencoder_kl"
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (64, 128, 256)
    temporal_down: Tuple[int, ...] = (1, 2, 2)  # per-level T stride
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class LVDMEncoder(nn.Module):
    config: LVDMAutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        x = _conv3(cfg.block_out_channels[0], (3, 3, 3), "conv_in", self.dtype)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            x = ResBlock3D(ch, groups=g, dtype=self.dtype,
                           name=f"down_{i}_res")(x)
            if i < len(cfg.block_out_channels) - 1:
                ts = cfg.temporal_down[i]
                x = _conv3(ch, (3, 3, 3), f"down_{i}_conv", self.dtype,
                           strides=(ts, 2, 2))(x)
        x = ResBlock3D(cfg.block_out_channels[-1], groups=g, dtype=self.dtype,
                       name="mid_res")(x)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(x)
        return _conv3(2 * cfg.latent_channels, (3, 3, 3), "conv_out",
                      self.dtype)(nn.silu(x))


class LVDMDecoder(nn.Module):
    config: LVDMAutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        x = _conv3(rev[0], (3, 3, 3), "conv_in", self.dtype)(z)
        x = ResBlock3D(rev[0], groups=g, dtype=self.dtype, name="mid_res")(x)
        for i, ch in enumerate(rev):
            x = ResBlock3D(ch, groups=g, dtype=self.dtype, name=f"up_{i}_res")(x)
            if i < len(rev) - 1:
                ts = cfg.temporal_down[len(rev) - 2 - i]
                b, t, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, t * ts, hh * 2, ww * 2, c),
                                     "nearest")
                x = _conv3(rev[i + 1], (3, 3, 3), f"up_{i}_conv", self.dtype)(x)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(x)
        return _conv3(cfg.out_channels, (3, 3, 3), "conv_out",
                      self.dtype)(nn.silu(x))


class LVDMAutoencoderModule(nn.Module):
    config: LVDMAutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = LVDMEncoder(self.config, dtype=self.dtype)
        self.decoder = LVDMDecoder(self.config, dtype=self.dtype)

    def encode(self, x) -> DiagonalGaussian:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, key=None):
        posterior = self.encode(x)
        z = posterior.sample(key) if key is not None else posterior.mode()
        return self.decode(z), posterior


class LVDMAutoencoderKL(PretrainedModel):
    config_class = LVDMAutoencoderConfig
    module_class = LVDMAutoencoderModule

    @classmethod
    def example_inputs(cls, config):
        import numpy as np

        t = int(np.prod(config.temporal_down))
        s = 4 * 2 ** (len(config.block_out_channels) - 1)
        return (jnp.zeros((1, 2 * t, s, s, config.in_channels)),), {}

    def encode(self, x):
        return self.module.apply({"params": self.params}, x,
                                 method=self.module.encode)

    def decode(self, z):
        return self.module.apply({"params": self.params}, z,
                                 method=self.module.decode)


# --------------------------------------------------------------- 3-D UNet
@dataclasses.dataclass
class LVDMUNet3DConfig(BaseConfig):
    model_type = "lvdm_unet_3d"
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    cross_attention_dim: Optional[int] = None  # None = unconditional
    norm_num_groups: int = 32
    sample_size: int = 32


class LVDMUNet3DModule(nn.Module):
    config: LVDMUNet3DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states=None):
        """sample: (B, T, H, W, C)."""
        cfg = self.config
        g = cfg.norm_num_groups
        b = sample.shape[0]
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t_emb = Timesteps(cfg.block_out_channels[0], True, 0.0)(timestep)
        emb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))

        x = _conv3(cfg.block_out_channels[0], (3, 3, 3), "conv_in",
                   self.dtype)(sample)
        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResBlock3D(ch, groups=g, temb=True, dtype=self.dtype,
                               name=f"down_{i}_res_{j}")(x, emb)
                x = STAttention(cfg.num_attention_heads, groups=g,
                                context_dim=cfg.cross_attention_dim,
                                dtype=self.dtype,
                                name=f"down_{i}_attn_{j}")(
                    x, encoder_hidden_states)
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = _conv3(ch, (3, 3, 3), f"down_{i}_ds", self.dtype,
                           strides=(1, 2, 2))(x)
                skips.append(x)

        x = ResBlock3D(cfg.block_out_channels[-1], groups=g, temb=True,
                       dtype=self.dtype, name="mid_res_0")(x, emb)
        x = STAttention(cfg.num_attention_heads, groups=g,
                        context_dim=cfg.cross_attention_dim, dtype=self.dtype,
                        name="mid_attn")(x, encoder_hidden_states)
        x = ResBlock3D(cfg.block_out_channels[-1], groups=g, temb=True,
                       dtype=self.dtype, name="mid_res_1")(x, emb)

        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResBlock3D(ch, groups=g, temb=True, dtype=self.dtype,
                               name=f"up_{i}_res_{j}")(x, emb)
                x = STAttention(cfg.num_attention_heads, groups=g,
                                context_dim=cfg.cross_attention_dim,
                                dtype=self.dtype,
                                name=f"up_{i}_attn_{j}")(
                    x, encoder_hidden_states)
            if i < len(cfg.block_out_channels) - 1:
                bb, tt, hh, ww, cc = x.shape
                x = jax.image.resize(x, (bb, tt, hh * 2, ww * 2, cc), "nearest")
                x = _conv3(cc, (3, 3, 3), f"up_{i}_us", self.dtype)(x)

        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(x)
        return _conv3(cfg.out_channels, (3, 3, 3), "conv_out",
                      self.dtype)(nn.silu(x))


class LVDMUNet3DModel(PretrainedModel):
    config_class = LVDMUNet3DConfig
    module_class = LVDMUNet3DModule

    @classmethod
    def example_inputs(cls, config):
        kwargs = {}
        if config.cross_attention_dim:
            kwargs["encoder_hidden_states"] = jnp.zeros(
                (1, 8, config.cross_attention_dim))
        return (jnp.zeros((1, 2, 8, 8, config.in_channels)),
                jnp.asarray(0)), kwargs
