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


class _NormP(nn.Module):
    """Param shim: declares nn.GroupNorm-compatible scale/bias without
    running the norm (the fused kernel consumes them directly)."""

    @nn.compact
    def __call__(self, c):
        return (self.param("scale", nn.initializers.ones, (c,)),
                self.param("bias", nn.initializers.zeros, (c,)))


class _ConvP(nn.Module):
    """Param shim: declares nn.Conv-compatible kernel/bias for a 3x3 conv."""

    features: int

    @nn.compact
    def __call__(self, cin):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def _fused_resnet_enabled() -> bool:
    import os

    from ...ops.dispatch import use_pallas
    return os.environ.get("PMIX_FUSED_RESNET", "0") == "1" and use_pallas()


class ResnetBlock2D(nn.Module):
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-5
    use_conv_shortcut: bool = False
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def _fused_call(self, x, temb, out_ch, scope):
        """Whole-block fused path: two Pallas GN+SiLU+int8-conv calls with
        bias/temb/residual in the epilogues (ops/fused_resnet.py). Static
        scales are consumed in record-trace order: conv1, conv2, shortcut."""
        from ...ops.fused_resnet import fused_gn_silu_conv3x3

        def nsx(raw):
            return max(float(raw), 1e-6) / 127.0

        g1, b1 = _NormP(name="norm1")(x.shape[-1])
        k1, cb1 = _ConvP(out_ch, name="conv1")(x.shape[-1])
        t = None
        if temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
        s1 = nsx(scope.next_scale())
        h = fused_gn_silu_conv3x3(x, g1, b1, self.groups, self.eps, k1, cb1,
                                  s1, temb=t)
        g2, b2 = _NormP(name="norm2")(out_ch)
        k2, cb2 = _ConvP(out_ch, name="conv2")(out_ch)
        s2 = nsx(scope.next_scale())
        sc = x
        if x.shape[-1] != out_ch:
            cg = _qcg(self.quant)
            if self.use_conv_shortcut:
                sc = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, conv_general_dilated=cg,
                             name="conv_shortcut")(x)
            else:
                sc = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                             conv_general_dilated=cg, name="conv_shortcut")(x)
        return fused_gn_silu_conv3x3(h, g2, b2, self.groups, self.eps, k2,
                                     cb2, s2, residual=sc)

    def _can_fuse(self, x, out_ch):
        if self.quant != "a8w8_static" or not _fused_resnet_enabled():
            return None
        from ...ops.fused_resnet import fused_supported
        from ...ops.quant import active_apply_scope

        scope = active_apply_scope()
        if scope is None:
            return None
        if not (fused_supported(x.shape, (3, 3, x.shape[-1], out_ch))
                and fused_supported((*x.shape[:3], out_ch),
                                    (3, 3, out_ch, out_ch))):
            return None
        try:  # scales must be trace-time constants for the kernel epilogue
            float(scope.scales[scope.i])
        except Exception:
            return None
        return scope

    @nn.compact
    def __call__(self, x, temb=None):
        out_ch = self.out_channels or x.shape[-1]
        scope = self._can_fuse(x, out_ch)
        if scope is not None:
            return self._fused_call(x, temb, out_ch, scope)
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
