"""AutoencoderKL (reference ppdiffusers/ppdiffusers/models/autoencoder_kl.py 474
+ vae.py). NHWC, diffusers-config/checkpoint compatible."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .attention import AttentionBlock2D
from .resnet import Downsample2D, GroupNormAct, ResnetBlock2D, Upsample2D


@dataclasses.dataclass
class AutoencoderKLConfig(BaseConfig):
    model_type = "autoencoder_kl"
    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",) * 4
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",) * 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    sample_size: int = 512
    scaling_factor: float = 0.18215
    shift_factor: Optional[float] = None
    mid_block_add_attention: bool = True
    # int8 conv mode for the DECODER only ("a8w8" dynamic / "a8w8_static"
    # trace-order calibrated — see ops/quant.py). The decoder carries ~6 TFLOP
    # of 3x3 convs at 1024px (58 ms of the 83 ms decode, xprof
    # tools/profile_vae.py); the encoder stays bf16 (training path).
    quant: Optional[str] = None


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, key):
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        logvar = jnp.clip(self.logvar, -30.0, 20.0)
        return 0.5 * jnp.sum(self.mean ** 2 + jnp.exp(logvar) - 1.0 - logvar,
                             axis=tuple(range(1, self.mean.ndim)))


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups, dtype=self.dtype,
                              name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    groups: int = 32
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups, quant=self.quant,
                              dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, quant=self.quant, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class VAEMidBlock(nn.Module):
    channels: int
    add_attention: bool
    groups: int = 32
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, groups=self.groups, quant=self.quant,
                          dtype=self.dtype, name="resnets_0")(x)
        if self.add_attention:
            x = AttentionBlock2D(groups=self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, groups=self.groups, quant=self.quant,
                          dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            last = i == len(cfg.block_out_channels) - 1
            x = DownEncoderBlock2D(ch, cfg.layers_per_block, add_downsample=not last,
                                   groups=g, dtype=self.dtype, name=f"down_blocks_{i}")(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], cfg.mid_block_add_attention, groups=g,
                        dtype=self.dtype, name="mid_block")(x)
        # fused reshape-free GN+SiLU (flax's grouped-reshape reduce makes XLA
        # emit full-tensor fp32 layout copies at these spatial sizes)
        x = GroupNormAct(groups=g, eps=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z)
        x = VAEMidBlock(rev[0], cfg.mid_block_add_attention, groups=g, quant=cfg.quant,
                        dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(rev):
            last = i == len(rev) - 1
            x = UpDecoderBlock2D(ch, cfg.layers_per_block + 1, add_upsample=not last,
                                 groups=g, quant=cfg.quant, dtype=self.dtype,
                                 name=f"up_blocks_{i}")(x)
        x = GroupNormAct(groups=g, eps=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class AutoencoderKLModule(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        posterior = self.encode(x)
        z = posterior.sample(key) if key is not None else posterior.mode()
        return self.decode(z), posterior


_VAE_KEY_MAP = (
    (r"\.to_out\.0\.", r".to_out."),
    (r"\.(\d+)\.", r"_\1."),
    (r"(^|\.)((conv_)?norm[^.]*|group_norm)\.weight$", r"\1\2.scale"),
    (r"\.weight$", r".kernel"),
)


class AutoencoderKL(PretrainedModel):
    config_class = AutoencoderKLConfig
    module_class = AutoencoderKLModule
    torch_key_map = _VAE_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.block_out_channels) - 1)
        s = 4 * f
        return (jnp.zeros((1, s, s, config.in_channels)),), {}

    def encode(self, x):
        return self.module.apply({"params": self.params}, x, method=self.module.encode)

    def decode(self, z):
        return self.module.apply({"params": self.params}, z, method=self.module.decode)
