"""VAE with temporal decoder for Stable Video Diffusion.

Rebuild of the reference's
ppdiffusers/ppdiffusers/models/autoencoder_kl_temporal_decoder.py (+
unet_3d_blocks.py MidBlockTemporalDecoder:1752 / UpBlockTemporalDecoder:1815):
the encoder is the plain 2D VAE encoder (frames fold into the batch); the
decoder interleaves SpatioTemporalResBlocks (merge_strategy="learned",
switched mixing) and finishes with a (3,1,1) temporal conv over frames.
Channels-last; all frame counts static so decode jits."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.modeling import PretrainedModel
from .attention import AttentionBlock2D
from .autoencoder_kl import AutoencoderKLConfig, DiagonalGaussian, Encoder
from .resnet import Upsample2D
from .unet_spatio_temporal import SpatioTemporalResBlock


@dataclasses.dataclass
class AutoencoderKLTemporalDecoderConfig(AutoencoderKLConfig):
    model_type = "autoencoder_kl_temporal_decoder"
    force_upcast: bool = True


class MidBlockTemporalDecoder(nn.Module):
    channels: int
    num_layers: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_only_indicator, num_frames):
        kw = dict(num_frames=num_frames, eps=1e-6, temporal_eps=1e-5,
                  merge_factor=0.0, merge_strategy="learned",
                  switch_spatial_to_temporal_mix=True, temb=False,
                  groups=self.groups, dtype=self.dtype)
        x = SpatioTemporalResBlock(self.channels, name="resnets_0", **kw)(
            x, None, image_only_indicator)
        for i in range(1, self.num_layers):
            x = AttentionBlock2D(groups=self.groups, dtype=self.dtype,
                                 name=f"attentions_{i-1}")(x)
            x = SpatioTemporalResBlock(self.channels, name=f"resnets_{i}", **kw)(
                x, None, image_only_indicator)
        return x


class UpBlockTemporalDecoder(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_only_indicator, num_frames):
        kw = dict(num_frames=num_frames, eps=1e-6, temporal_eps=1e-5,
                  merge_factor=0.0, merge_strategy="learned",
                  switch_spatial_to_temporal_mix=True, temb=False,
                  groups=self.groups, dtype=self.dtype)
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, name=f"resnets_{i}", **kw)(
                x, None, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class TemporalDecoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, image_only_indicator, num_frames):
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        x = MidBlockTemporalDecoder(rev[0], cfg.layers_per_block,
                                    groups=cfg.norm_num_groups,
                                    dtype=self.dtype, name="mid_block")(
            x, image_only_indicator, num_frames)
        for i, ch in enumerate(rev):
            last = i == len(rev) - 1
            x = UpBlockTemporalDecoder(ch, cfg.layers_per_block + 1,
                                       add_upsample=not last,
                                       groups=cfg.norm_num_groups,
                                       dtype=self.dtype, name=f"up_blocks_{i}")(
                x, image_only_indicator, num_frames)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(nn.silu(x))
        # final temporal smoothing conv over frames: (B, F, H, W, C)
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        vid = x.reshape(b, num_frames, hh, ww, c)
        vid = nn.Conv(c, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                      dtype=self.dtype, name="time_conv_out")(vid)
        return vid.reshape(bf, hh, ww, c)


class AutoencoderKLTemporalDecoderModule(nn.Module):
    config: AutoencoderKLTemporalDecoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype)
        # NOTE: unlike the 2D VAE, the reference has quant_conv only (no
        # post_quant_conv), autoencoder_kl_temporal_decoder.py:218
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z, num_frames: int = 1):
        b = z.shape[0] // num_frames
        indicator = jnp.zeros((b, num_frames), jnp.float32)
        return self.decoder(z, indicator, num_frames)

    def __call__(self, x, num_frames: int = 1, key=None):
        posterior = self.encode(x)
        z = posterior.sample(key) if key is not None else posterior.mode()
        return self.decode(z, num_frames), posterior


_TEMPORAL_VAE_KEY_MAP = (
    (r"\.to_out\.0\.", r".to_out."),
    (r"\.(\d+)\.", r"_\1."),
    (r"(^|\.)((conv_)?norm[^.]*|group_norm)\.weight$", r"\1\2.scale"),
    (r"\.weight$", r".kernel"),
)


class AutoencoderKLTemporalDecoder(PretrainedModel):
    config_class = AutoencoderKLTemporalDecoderConfig
    module_class = AutoencoderKLTemporalDecoderModule
    torch_key_map = _TEMPORAL_VAE_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.block_out_channels) - 1)
        s = 4 * f
        return (jnp.zeros((2, s, s, config.in_channels)),), {"num_frames": 2}

    def encode(self, x):
        return self.module.apply({"params": self.params}, x,
                                 method=self.module.encode)

    def decode(self, z, num_frames: int = 1):
        return self.module.apply({"params": self.params}, z, num_frames,
                                 method=self.module.decode)
