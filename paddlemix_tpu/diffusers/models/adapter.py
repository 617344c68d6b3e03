"""T2I-Adapter condition networks.

Rebuild of the reference's ppdiffusers/models/adapter.py (T2IAdapter with
FullAdapter / FullAdapterXL / LightAdapter bodies): a small conv trunk turns
a condition image (sketch/depth/canny/...) into one feature map per UNet down
block, injected as intrablock residuals. NHWC; the 8x pixel-unshuffle is a
reshape-transpose (free on TPU)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel


def pixel_unshuffle(x, factor: int):
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // factor, w // factor,
                                                 c * factor * factor)


@dataclasses.dataclass
class T2IAdapterConfig(BaseConfig):
    model_type = "t2i_adapter"
    in_channels: int = 3
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_res_blocks: int = 2
    downscale_factor: int = 8
    adapter_type: str = "full_adapter"  # full_adapter | full_adapter_xl | light_adapter


class _AdapterResnet(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="block1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="block2")(h)
        return x + h


class _AdapterBlock(nn.Module):
    channels: int
    num_res_blocks: int
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="in_conv")(x)
        for i in range(self.num_res_blocks):
            x = _AdapterResnet(self.channels, dtype=self.dtype,
                               name=f"resnets_{i}")(x)
        return x


class T2IAdapterModule(nn.Module):
    config: T2IAdapterConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image):
        """image: (B, H, W, C) in [-1, 1] (or [0,1]; the trunk is agnostic).
        Returns one feature map per UNet down block, resolutions H/8, H/16..."""
        cfg = self.config
        x = pixel_unshuffle(image, cfg.downscale_factor)
        x = nn.Conv(cfg.channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        feats = []
        for i, ch in enumerate(cfg.channels):
            x = _AdapterBlock(ch, cfg.num_res_blocks, down=i > 0,
                              dtype=self.dtype, name=f"body_{i}")(x)
            feats.append(x)
        return feats


class T2IAdapter(PretrainedModel):
    config_class = T2IAdapterConfig
    module_class = T2IAdapterModule

    @classmethod
    def example_inputs(cls, config):
        s = config.downscale_factor * 8
        return (jnp.zeros((1, s, s, config.in_channels)),), {}

    def __call__(self, image):
        return self.module.apply({"params": self.params},
                                 image.astype(self.dtype))
