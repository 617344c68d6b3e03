"""HiFi-GAN vocoder: mel spectrogram -> waveform.

Rebuild of the reference vocoder (paddlemix/models/audioldm2/hifigan/):
transposed-conv upsampling stacks with multi-receptive-field residual blocks.
NLC layout (time on axis 1) — XLA maps 1D convs onto the MXU via im2col."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel


@dataclasses.dataclass
class HiFiGANConfig(BaseConfig):
    model_type = "hifigan"
    model_in_dim: int = 64             # mel bins
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding="SAME", dtype=self.dtype, name=f"convs1_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class HiFiGANModule(nn.Module):
    config: HiFiGANConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, n_mels) -> waveform (B, T * hop_length)."""
        cfg = self.config
        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding="SAME",
                    dtype=self.dtype, name="conv_pre")(mel)
        ch = cfg.upsample_initial_channel
        for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, 0.1)
            ch //= 2
            x = nn.ConvTranspose(ch, (k,), strides=(rate,), padding="SAME",
                                 dtype=self.dtype, name=f"ups_{i}")(x)
            # multi-receptive-field fusion
            acc = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                r = ResBlock1(ch, rk, tuple(rd), dtype=self.dtype,
                              name=f"resblocks_{i}_{j}")(x)
                acc = r if acc is None else acc + r
            x = acc / len(cfg.resblock_kernel_sizes)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class HiFiGANVocoder(PretrainedModel):
    config_class = HiFiGANConfig
    module_class = HiFiGANModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 8, config.model_in_dim)),), {}

    def decode(self, mel):
        return self.module.apply({"params": self.params}, mel)
