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
def _pallas_ok(h: int) -> bool:
    return use_pallas() and h % 128 == 0


def rms_norm(x, weight, eps: float = 1e-6):
    h = x.shape[-1]
    if not _pallas_ok(h):
        return rms_norm_xla(x, weight, eps)
    x2d = x.reshape(-1, h)
    return _rms_norm_pallas(x2d, weight, eps).reshape(x.shape)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    h = x.shape[-1]
    if weight is None or bias is None or not _pallas_ok(h):
        return layer_norm_xla(x, weight, bias, eps)
    x2d = x.reshape(-1, h)
    return _layer_norm_pallas(x2d, weight, bias, eps).reshape(x.shape)


def adaptive_layer_norm(x, scale, shift, weight=None, bias=None, eps: float = 1e-5):
    """Fused LN + AdaLN modulate. x: (B,S,H), scale/shift: (B,H).

    Pallas forward only (the op is inference-hot in the reference's
    simplified_sd3.py:64-108); gradients flow through the XLA composition."""
    if weight is not None or bias is not None or not _pallas_ok(x.shape[-1]) or x.ndim != 3:
        return adaptive_layer_norm_xla(x, scale, shift, weight, bias, eps)
    return _adaln_pallas(x, scale, shift, eps)


def fused_adaln_scale_residual(residual, x, gate, scale, shift,
                               weight=None, bias=None, eps: float = 1e-5):
    if weight is not None or bias is not None or not _pallas_ok(x.shape[-1]) or x.ndim != 3:
        return fused_adaln_scale_residual_xla(residual, x, gate, scale, shift, weight, bias, eps)
    return _fused_adaln_pallas(residual, x, gate, scale, shift, eps)
