"""Fused normalization ops: Pallas kernels + XLA references.

TPU-native equivalents of:
 - fast_ln / fused_ln CUDA kernels (reference paddlemix/external_ops/fast_ln/
   ln_fwd_cuda_kernel.cu, ln_bwd_semi_cuda_kernel.cu; fused_ln/layer_norm_cuda.cu)
   -> layer_norm / rms_norm Pallas kernels with custom_vjp (fwd + bwd fused).
 - triton rms_norm (reference paddlemix/triton_ops/triton_ops.py:1235)
 - triton adaptive_layer_norm (reference triton_ops.py:1030)
 - triton fused_adaLN_scale_residual (reference triton_ops.py:758)

All public functions accept (..., hidden) inputs; the Pallas path requires
hidden % 128 == 0 and falls back to XLA otherwise (mirroring the reference's
python fallbacks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode, use_pallas

_BLOCK_ROWS = 256


# =============================================================== XLA references
def rms_norm_xla(x, weight, eps: float = 1e-6):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm_xla(x, weight=None, bias=None, eps: float = 1e-5):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def adaptive_layer_norm_xla(x, scale, shift, weight=None, bias=None, eps: float = 1e-5):
    """y = LN(x) * (1 + scale) + shift; scale/shift: (B, H) vs x: (B, S, H)."""
    y = layer_norm_xla(x, weight, bias, eps)
    return y * (1.0 + scale[:, None, :]) + shift[:, None, :]


def fused_adaln_scale_residual_xla(residual, x, gate, scale, shift,
                                   weight=None, bias=None, eps: float = 1e-5):
    """resi_out = residual + gate * x;  y = LN(resi_out) * (1+scale) + shift.

    Matches the fusion boundary of the reference triton kernel
    (triton_ops.py:758 fused_adaLN_scale_residual)."""
    resi_out = residual + gate[:, None, :] * x
    y = adaptive_layer_norm_xla(resi_out, scale, shift, weight, bias, eps)
    return y, resi_out


# =============================================================== Pallas kernels
def _rms_fwd_kernel(x_ref, w_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    y_ref[...] = (y * w_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _rms_bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, *, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    h = x.shape[-1]
    rstd = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    xhat = x * rstd
    dxhat = g * w
    dx = rstd * (dxhat - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw_ref[...] += jnp.sum(g * xhat, axis=0, keepdims=True)


def _ln_fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref, *, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True) + eps)
    xhat = (x - mu) * rstd
    dxhat = g * w
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw_ref[...] += jnp.sum(g * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(g, axis=0, keepdims=True)


def _row_grid(n_rows: int):
    block = min(_BLOCK_ROWS, n_rows)
    while n_rows % block != 0:
        block //= 2
    return max(block, 1)


def _pad_rows(x2d):
    return x2d, x2d.shape[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rms_norm_pallas(x2d, w, eps):
    return _rms_norm_pallas_fwd_impl(x2d, w, eps)


def _rms_norm_pallas_fwd_impl(x2d, w, eps):
    n, h = x2d.shape
    block = _row_grid(n)
    return pl.pallas_call(
        functools.partial(_rms_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, h), x2d.dtype),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x2d, w[None, :])


def _rms_norm_pallas_fwd(x2d, w, eps):
    return _rms_norm_pallas_fwd_impl(x2d, w, eps), (x2d, w)


def _rms_norm_pallas_bwd(eps, res, g):
    x2d, w = res
    n, h = x2d.shape
    block = _row_grid(n)
    dx, dw = pl.pallas_call(
        functools.partial(_rms_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2d.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret_mode(),
    )(x2d, w[None, :], g)
    return dx, dw[0].astype(w.dtype)


_rms_norm_pallas.defvjp(_rms_norm_pallas_fwd, _rms_norm_pallas_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_pallas(x2d, w, b, eps):
    return _layer_norm_pallas_fwd_impl(x2d, w, b, eps)


def _layer_norm_pallas_fwd_impl(x2d, w, b, eps):
    n, h = x2d.shape
    block = _row_grid(n)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, h), x2d.dtype),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x2d, w[None, :], b[None, :])


def _layer_norm_pallas_fwd(x2d, w, b, eps):
    return _layer_norm_pallas_fwd_impl(x2d, w, b, eps), (x2d, w)


def _layer_norm_pallas_bwd(eps, res, g):
    x2d, w = res
    n, h = x2d.shape
    block = _row_grid(n)
    dx, dw, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2d.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret_mode(),
    )(x2d, w[None, :], g)
    return dx, dw[0].astype(w.dtype), db[0].astype(w.dtype)


_layer_norm_pallas.defvjp(_layer_norm_pallas_fwd, _layer_norm_pallas_bwd)


def _adaln_kernel(x_ref, scale_ref, shift_ref, y_ref, *, eps, affine):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + scale_ref[...].astype(jnp.float32)) + shift_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _adaln_pallas_fwd_impl(x, scale, shift, eps):
    """x: (B, S, H); scale/shift: (B, H). Grid over batch; LN+modulate fused."""
    b, s, h = x.shape
    return pl.pallas_call(
        functools.partial(_adaln_kernel, eps=eps, affine=False),
        out_shape=jax.ShapeDtypeStruct((b, s, h), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x, scale[:, None, :], shift[:, None, :])


def _fused_adaln_residual_kernel(resi_ref, x_ref, gate_ref, scale_ref, shift_ref,
                                 y_ref, resi_out_ref, *, eps):
    resi = resi_ref[...].astype(jnp.float32) + gate_ref[...].astype(jnp.float32) * x_ref[...].astype(jnp.float32)
    resi_out_ref[...] = resi.astype(resi_out_ref.dtype)
    mu = jnp.mean(resi, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(resi - mu), axis=-1, keepdims=True)
    y = (resi - mu) * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + scale_ref[...].astype(jnp.float32)) + shift_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _fused_adaln_residual_pallas(residual, x, gate, scale, shift, eps):
    b, s, h = x.shape
    return pl.pallas_call(
        functools.partial(_fused_adaln_residual_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, h), x.dtype),
            jax.ShapeDtypeStruct((b, s, h), x.dtype),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret_mode(),
    )(residual, x, gate[:, None, :], scale[:, None, :], shift[:, None, :])


# pallas forward + XLA-recompute backward (adaLN ops are inference-hot in the
# reference; training still needs grads to flow)
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _adaln_pallas(x, scale, shift, eps):
    return _adaln_pallas_fwd_impl(x, scale, shift, eps)


def _adaln_fwd(x, scale, shift, eps):
    return _adaln_pallas_fwd_impl(x, scale, shift, eps), (x, scale, shift)


def _adaln_bwd(eps, res, g):
    x, scale, shift = res
    _, vjp = jax.vjp(lambda a, b, c: adaptive_layer_norm_xla(a, b, c, eps=eps), x, scale, shift)
    return vjp(g)


_adaln_pallas.defvjp(_adaln_fwd, _adaln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_adaln_pallas(residual, x, gate, scale, shift, eps):
    return _fused_adaln_residual_pallas(residual, x, gate, scale, shift, eps)


def _fused_adaln_fwd(residual, x, gate, scale, shift, eps):
    out = _fused_adaln_residual_pallas(residual, x, gate, scale, shift, eps)
    return out, (residual, x, gate, scale, shift)


def _fused_adaln_bwd(eps, res, g):
    residual, x, gate, scale, shift = res
    _, vjp = jax.vjp(
        lambda r, a, gt, sc, sh: fused_adaln_scale_residual_xla(r, a, gt, sc, sh, eps=eps),
        residual, x, gate, scale, shift,
    )
    return vjp(g)


_fused_adaln_pallas.defvjp(_fused_adaln_fwd, _fused_adaln_bwd)


# =============================================================== public API
# Below this row count a Pallas launch is pure overhead: the kernel's win is
# HBM bandwidth on big tensors, while at decode shapes (1-8 rows/token) the
# custom call costs launch latency AND blocks XLA from fusing the norm into
# its neighbors (32-layer llama decode = 64 norm calls/token on the
# latency-bound path).
_MIN_PALLAS_ROWS = 64


def _pallas_ok(h: int, rows: int) -> bool:
    return use_pallas() and h % 128 == 0 and rows >= _MIN_PALLAS_ROWS


def rms_norm(x, weight, eps: float = 1e-6):
    h = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    if not _pallas_ok(h, rows):
        return rms_norm_xla(x, weight, eps)
    x2d = x.reshape(-1, h)
    return _rms_norm_pallas(x2d, weight, eps).reshape(x.shape)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    h = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    if weight is None or bias is None or not _pallas_ok(h, rows):
        return layer_norm_xla(x, weight, bias, eps)
    x2d = x.reshape(-1, h)
    return _layer_norm_pallas(x2d, weight, bias, eps).reshape(x.shape)


def adaptive_layer_norm(x, scale, shift, weight=None, bias=None, eps: float = 1e-5):
    """Fused LN + AdaLN modulate. x: (B,S,H), scale/shift: (B,H).

    Pallas forward only (the op is inference-hot in the reference's
    simplified_sd3.py:64-108); gradients flow through the XLA composition."""
    rows = int(np.prod(x.shape[:-1]))
    if weight is not None or bias is not None \
            or not _pallas_ok(x.shape[-1], rows) or x.ndim != 3:
        return adaptive_layer_norm_xla(x, scale, shift, weight, bias, eps)
    return _adaln_pallas(x, scale, shift, eps)


def fused_adaln_scale_residual(residual, x, gate, scale, shift,
                               weight=None, bias=None, eps: float = 1e-5):
    rows = int(np.prod(x.shape[:-1]))
    if weight is not None or bias is not None \
            or not _pallas_ok(x.shape[-1], rows) or x.ndim != 3:
        return fused_adaln_scale_residual_xla(residual, x, gate, scale, shift, weight, bias, eps)
    return _fused_adaln_pallas(residual, x, gate, scale, shift, eps)


# ==================================================== fused GroupNorm (+act)
# Replaces nn.GroupNorm + silu in the UNet/VAE resnet hot path (the reference
# leans on CUDA fused_ln for the same reason, paddlemix/external_ops/). NHWC
# GroupNorm is HBM-bound; XLA's composition runs at ~1/4 of peak BW. This
# kernel reads x twice and writes once (grid phase 0: per-tile sum/sumsq
# accumulation; phase 1: normalize+affine+silu). Group reductions happen in
# lane space via a tiny (C, G) one-hot matmul so no reshapes touch the lane
# dim.

def _gn_kernel(x_ref, w_ref, b_ref, o_ref, s_scr, s2_scr, *, groups, eps,
               n_rows, act, c):
    phase = pl.program_id(1)
    ti = pl.program_id(2)

    @pl.when((phase == 0) & (ti == 0))
    def _init():
        s_scr[...] = jnp.zeros_like(s_scr)
        s2_scr[...] = jnp.zeros_like(s2_scr)

    @pl.when(phase == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)  # (tile_rows, C)
        s_scr[...] += jnp.sum(x, axis=0, keepdims=True)
        s2_scr[...] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _normalize():
        cpg = c // groups
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        gid = lane // cpg  # (1, C) group id per channel
        # lane-space group reduce: member (C, G) one-hot, sums via MXU
        member = (gid.reshape(c, 1) == jax.lax.broadcasted_iota(
            jnp.int32, (c, groups), 1)).astype(jnp.float32)
        gsum = jax.lax.dot(s_scr[...], member,
                           preferred_element_type=jnp.float32)   # (1, G)
        gsum2 = jax.lax.dot(s2_scr[...], member,
                            preferred_element_type=jnp.float32)  # (1, G)
        cnt = jnp.float32(n_rows * cpg)
        mean_g = gsum / cnt
        var_g = jnp.maximum(gsum2 / cnt - mean_g * mean_g, 0.0)
        inv_g = jax.lax.rsqrt(var_g + eps)
        # back to channel space
        mean_c = jax.lax.dot(mean_g, member.T, preferred_element_type=jnp.float32)
        inv_c = jax.lax.dot(inv_g, member.T, preferred_element_type=jnp.float32)
        w = w_ref[...].astype(jnp.float32)
        b = b_ref[...].astype(jnp.float32)
        scale = inv_c * w
        shift = b - mean_c * scale
        x = x_ref[0].astype(jnp.float32)
        y = x * scale + shift
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


def _group_norm_pallas_impl(x3, w, b, groups, eps, act):
    bsz, n_rows, c = x3.shape
    # block must fit VMEM together with its fp32 upcasts: cap at ~1MB bf16
    tile = n_rows
    while tile * c * 2 > 1 << 20 or (n_rows % tile):
        tile //= 2
    nt = n_rows // tile
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, n_rows=n_rows,
                          act=act, c=c),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        grid=(bsz, 2, nt),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bb, ph, t: (bb, t, 0)),
            pl.BlockSpec((1, c), lambda bb, ph, t: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, ph, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bb, ph, t: (bb, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(x3, w.reshape(1, c), b.reshape(1, c))


def group_norm_silu_xla(x, weight, bias, groups: int, eps: float = 1e-5,
                        act: str = "silu"):
    """Channel-minor GroupNorm without reshaping the big tensor.

    Splitting C into (groups, C/groups) on the activation itself makes the
    group dim part of the lane layout, and XLA answers with full-tensor fp32
    layout copies around the reduce (profiled at ~10ms/step on the SDXL UNet).
    Instead: reduce per-channel in the natural NHWC layout (convert+square
    fuse into the reduce, nothing fp32 is materialized), then aggregate the
    tiny (B, C) moments into (B, groups) and broadcast per-channel
    scale/shift back — the normalize is one fused elementwise pass."""
    c = x.shape[-1]
    cpg = c // groups
    red = tuple(range(1, x.ndim - 1))
    n = float(np.prod(x.shape[1:-1]) * cpg)
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=red)        # (B, C)
    s2 = jnp.sum(xf * xf, axis=red)  # (B, C)
    gs = s.reshape(-1, groups, cpg).sum(-1)    # (B, G)
    gs2 = s2.reshape(-1, groups, cpg).sum(-1)  # (B, G)
    mean = gs / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=-1)    # (B, C)
    inv_c = jnp.repeat(inv, cpg, axis=-1)
    scale = inv_c * weight.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean_c * scale
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
    # note: an optimization_barrier here (to stop the f32 upcast being CSE'd
    # and the producer fusion duplicated) measures 5% SLOWER end-to-end on
    # the SDXL UNet — XLA's duplicate-producer choice wins over the extra
    # bf16 round-trip, so leave the shared upcast alone
    y = xf * scale.reshape(bshape) + shift.reshape(bshape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_pallas(x3, w, b, groups, eps, act):
    return _group_norm_pallas_impl(x3, w, b, groups, eps, act)


def _group_norm_fwd(x3, w, b, groups, eps, act):
    return _group_norm_pallas_impl(x3, w, b, groups, eps, act), (x3, w, b)


def _group_norm_bwd(groups, eps, act, res, g):
    x3, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: group_norm_silu_xla(x, w, b, groups, eps, act),
                     x3, w, b)
    return vjp(g)


_group_norm_pallas.defvjp(_group_norm_fwd, _group_norm_bwd)


def group_norm(x, weight, bias, groups: int, eps: float = 1e-5,
               act: str = "none"):
    """GroupNorm over NHWC/NLC (..., C) with optional fused SiLU.

    Measured on v5e: XLA's fused composition already runs at ~745 GB/s for
    the UNet shapes and BEATS the two-phase Pallas kernel (which pays an
    extra serial grid pass), so XLA is the default; the Pallas path stays
    available via PADDLEMIX_PALLAS_GROUPNORM=1 for future tuning."""
    import os

    c = x.shape[-1]
    use_kernel = os.environ.get("PADDLEMIX_PALLAS_GROUPNORM") == "1"
    if not use_kernel or not use_pallas() or c % groups or x.ndim < 3:
        return group_norm_silu_xla(x, weight, bias, groups, eps, act)
    n_rows = int(np.prod(x.shape[1:-1]))
    if n_rows % 256:
        return group_norm_silu_xla(x, weight, bias, groups, eps, act)
    x3 = x.reshape(x.shape[0], n_rows, c)
    return _group_norm_pallas(x3, weight, bias, groups, eps, act).reshape(x.shape)
