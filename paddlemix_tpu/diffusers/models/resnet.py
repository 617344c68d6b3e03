"""UNet resnet/updown blocks (reference ppdiffusers/ppdiffusers/models/resnet.py).

NHWC layout throughout (TPU conv layout). Module/param names mirror the
diffusers torch layout (norm1/conv1/time_emb_proj/...) so checkpoint key
conversion is a pure regex rename + layout transpose."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.norms import group_norm


def _qcg(quant):
    if quant == "a8w8":
        from ...ops.quant import quantizing_conv_general_dilated
        return quantizing_conv_general_dilated
    if quant == "a8w8_static":
        from ...ops.quant import static_quant_conv_general_dilated
        return static_quant_conv_general_dilated
    return None


class GroupNormAct(nn.Module):
    """GroupNorm with fused SiLU via the Pallas kernel (param names match
    nn.GroupNorm: scale/bias, so checkpoints are unaffected)."""

    groups: int = 32
    eps: float = 1e-5
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, self.groups, self.eps, act=self.act)


class ResnetBlock2D(nn.Module):
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-5
    use_conv_shortcut: bool = False
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        out_ch = self.out_channels or x.shape[-1]
        cg = _qcg(self.quant)
        h = GroupNormAct(self.groups, self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    conv_general_dilated=cg, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNormAct(self.groups, self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    conv_general_dilated=cg, name="conv2")(h)
        if x.shape[-1] != out_ch:
            if self.use_conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            conv_general_dilated=cg, name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                            conv_general_dilated=cg, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: Optional[int] = None
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        return nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, conv_general_dilated=_qcg(self.quant),
                       name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: Optional[int] = None
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       conv_general_dilated=_qcg(self.quant), name="conv")(x)
