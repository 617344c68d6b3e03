"""UNet1D (dance-diffusion / k-diffusion family) — reference
ppdiffusers/models/unet_1d.py + unet_1d_blocks.py. Channels-last (B, L, C);
the cubic anti-aliasing down/up-samplers are depthwise convolutions
(feature_group_count=C) so XLA keeps them on the VPU-friendly path, and the
Fourier timestep embedding is concatenated as input channels
(use_timestep_embedding=False configuration, the dance-diffusion default)."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel

_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375, 0.43359375,
              0.11328125, -0.03515625, -0.01171875],
}


def _depthwise_resample(x, kernel_name: str, up: bool):
    """x: (B, L, C). Anti-aliased 2x resample with a fixed depthwise kernel."""
    k = jnp.asarray(_KERNELS[kernel_name], x.dtype)
    c = x.shape[-1]
    pad = k.shape[0] // 2 - 1
    w = jnp.tile(k[:, None, None], (1, 1, c))  # (K, 1, C) depthwise
    if not up:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c)
    x = jnp.pad(x, ((0, 0), ((pad + 1) // 2,) * 2, (0, 0)), mode="reflect")
    return _conv_transpose_depthwise(x, w * 2.0, pad)


def _conv_transpose_depthwise(x, w, pad):
    # lax.conv_transpose has no grouped path; depthwise transpose = input
    # dilation + regular depthwise conv
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(w.shape[0] - 1 - (pad * 2 + 1),) * 2],
        lhs_dilation=(2,), dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c)


class ResConvBlock(nn.Module):
    """conv5 -> GN(1) -> GELU -> conv5 (+ conv-skip), unet_1d_blocks.py:425."""

    mid_channels: int
    out_channels: int
    is_last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1,), use_bias=False,
                          dtype=self.dtype, name="conv_skip")(x)
        h = nn.Conv(self.mid_channels, (5,), padding=((2, 2),), dtype=self.dtype,
                    name="conv_1")(x)
        h = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="group_norm_1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.out_channels, (5,), padding=((2, 2),), dtype=self.dtype,
                    name="conv_2")(h)
        if not self.is_last:
            h = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="group_norm_2")(h)
            h = nn.gelu(h, approximate=False)
        return h + res


class SelfAttention1d(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops import scaled_dot_product_attention

        b, l, c = x.shape
        h = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="group_norm")(x)
        q = nn.Dense(c, dtype=self.dtype, name="query")(h)
        k = nn.Dense(c, dtype=self.dtype, name="key")(h)
        v = nn.Dense(c, dtype=self.dtype, name="value")(h)
        hd = c // self.num_heads
        out = scaled_dot_product_attention(
            q.reshape(b, l, self.num_heads, hd), k.reshape(b, l, self.num_heads, hd),
            v.reshape(b, l, self.num_heads, hd)).reshape(b, l, c)
        return x + nn.Dense(c, dtype=self.dtype, name="proj_attn")(out)


class _ResStack(nn.Module):
    mid_channels: int
    out_channels: int
    attn: bool = False
    last_block_is_last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = [self.mid_channels, self.mid_channels, self.out_channels]
        for i, ch in enumerate(chans):
            is_last = self.last_block_is_last and i == len(chans) - 1
            x = ResConvBlock(self.mid_channels, ch, is_last=is_last,
                             dtype=self.dtype, name=f"resnets_{i}")(x)
            if self.attn and not is_last:
                x = SelfAttention1d(max(ch // 32, 1), dtype=self.dtype,
                                    name=f"attentions_{i}")(x)
            elif self.attn and is_last:
                x = SelfAttention1d(max(ch // 32, 1), dtype=self.dtype,
                                    name=f"attentions_{i}")(x)
        return x


@dataclasses.dataclass
class UNet1DConfig(BaseConfig):
    model_type = "unet_1d"
    sample_size: int = 65536
    in_channels: int = 2
    out_channels: int = 2
    extra_in_channels: int = 16
    block_out_channels: Tuple[int, ...] = (32, 32, 64)
    down_block_types: Tuple[str, ...] = ("DownBlock1DNoSkip", "DownBlock1D",
                                         "AttnDownBlock1D")
    up_block_types: Tuple[str, ...] = ("AttnUpBlock1D", "UpBlock1D",
                                       "UpBlock1DNoSkip")
    mid_block_type: str = "UNetMidBlock1D"
    flip_sin_to_cos: bool = True


class UNet1DModule(nn.Module):
    config: UNet1DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep):
        cfg = self.config
        b, l, _ = sample.shape
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))

        # Gaussian Fourier projection (embedding_size=8 -> 16 channels),
        # broadcast along length and concatenated as input channels
        w = self.param("time_proj_weight",
                       nn.initializers.normal(1.0), (8,))
        f = timestep.astype(jnp.float32)[:, None] * \
            jax.lax.stop_gradient(w)[None, :] * 2 * math.pi
        temb = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1) \
            if cfg.flip_sin_to_cos else jnp.concatenate([jnp.sin(f), jnp.cos(f)], -1)
        temb = jnp.broadcast_to(temb[:, None, :], (b, l, temb.shape[-1]))
        x = jnp.concatenate([sample, temb.astype(sample.dtype)], axis=-1)

        skips = []
        for i, bt in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            if bt != "DownBlock1DNoSkip":
                x = _depthwise_resample(x, "cubic", up=False)
            x = _ResStack(ch, ch, attn=bt.startswith("Attn"), dtype=self.dtype,
                          name=f"down_blocks_{i}")(x)
            skips.append(x)

        mid = cfg.block_out_channels[-1]
        x = _depthwise_resample(x, "cubic", up=False)
        x = _ResStack(mid, mid, attn=True, dtype=self.dtype, name="mid_res_a")(x)
        x = _ResStack(mid, mid, attn=True, dtype=self.dtype, name="mid_res_b")(x)
        x = _depthwise_resample(x, "cubic", up=True)

        rev = list(reversed(cfg.block_out_channels))
        for i, bt in enumerate(cfg.up_block_types):
            out_ch = rev[i + 1] if i < len(cfg.up_block_types) - 1 else \
                cfg.out_channels
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            last = bt == "UpBlock1DNoSkip"
            x = _ResStack(rev[i], out_ch if not last else cfg.out_channels,
                          attn=bt.startswith("Attn"), last_block_is_last=last,
                          dtype=self.dtype, name=f"up_blocks_{i}")(x)
            if not last:
                x = _depthwise_resample(x, "cubic", up=True)
        return x


class UNet1DModel(PretrainedModel):
    config_class = UNet1DConfig
    module_class = UNet1DModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 64, config.in_channels)), jnp.zeros(())), {})
