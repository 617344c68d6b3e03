"""Weight-only int8 quantized matmul.

TPU-native equivalent of the reference's triton weight_only_int8 kernel
(paddlemix/triton_ops/triton_ops.py:464): activations stay bf16/fp32, weights
are int8 with a per-output-channel fp scale; dequantize fused into the matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode, use_pallas


def quantize_weights_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: (in, out) -> (int8 weights, per-out-channel fp32 scales)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weights_int4(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: (in, out) -> (packed int8 (in//2, out), per-out-channel fp32 scales).

    Symmetric int4: values in [-7, 7], scale = absmax/7. Byte layout packs
    row k (low nibble) with row k + in//2 (high nibble) — the halves split
    keeps the dot over k order-free, so the unpack is two shifts and a
    concat instead of an interleave (TPU counterpart of the reference's
    paddlenlp weight_only_int4, deploy/llava/README.md --quant_type)."""
    k = w.shape[0]
    assert k % 2 == 0, "int4 pack needs an even input dim"
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -7, 7).astype(jnp.int8)
    lo, hi = q[: k // 2], q[k // 2:]
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4), jnp.bitwise_and(lo, 15))
    return packed, scale


def unpack_int4(packed: jnp.ndarray):
    """(in//2, out) packed int8 -> (in, out) jnp.int4 (XLA-native S4).

    Inside a decode while_loop this is loop-invariant, so XLA hoists it and
    materializes the S4 weight ONCE per call — the loop body then streams
    true 0.5 byte/value from HBM (the whole point: decode is weight-HBM
    bound, int4 halves the bytes of int8 again). Arithmetic shifts
    sign-extend the nibbles."""
    w32 = packed.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.int4)
    hi = ((w32 << 24) >> 28).astype(jnp.int4)
    return jnp.concatenate([lo, hi], axis=0)


def unpack_tree_int4(params):
    """Replace every packed int4 ``kernel_q`` leaf with its unpacked S4 form.

    Call INSIDE a jitted generate body BEFORE the decode while_loop, and only
    on an a8w4-quantized tree. Rationale (r4 on-chip profile): XLA's loop
    LICM refuses to hoist the multi-GB unpack out of the decode while_loop,
    so left in the module the unpack re-runs every token (read packed +
    write S4 + read S4 = 3x the HBM traffic of the S4 dot alone, measured
    83.8 vs 103.4 tok/s a8w8). Unpacked here it materializes once per
    generate call and the loop streams pure 0.5 B/weight. S4 cannot cross
    the jit boundary itself (PJRT sub-byte transfer bug), which is why this
    lives inside the jit instead of at quantize time."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict) and "kernel_q" in child \
                    and "scale" in child \
                    and getattr(child["kernel_q"], "ndim", 0) == 2:
                out[name] = {
                    k: (unpack_int4(v) if k == "kernel_q" else walk(v))
                    for k, v in child.items()
                }
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def quantize_tree_int4(params, min_bytes: int = 1 << 20):
    """Like quantize_tree_wint8 but packs int4: kernel_q (in//2, out) int8 +
    scale (out,) fp32. Same donation discipline (peak = params + ONE leaf)."""
    quant_one = jax.jit(quantize_weights_int4, donate_argnums=0)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict) and "kernel" in child \
                    and getattr(child["kernel"], "ndim", 0) == 2 \
                    and child["kernel"].shape[0] % 2 == 0 \
                    and child["kernel"].size * 2 >= min_bytes:
                w = jnp.asarray(child["kernel"])
                q, scale = quant_one(w)
                jax.block_until_ready(q)
                if hasattr(w, "delete") and not w.is_deleted():
                    w.delete()
                rest = {k: v for k, v in child.items() if k != "kernel"}
                out[name] = {"kernel_q": q, "scale": scale, **walk(rest)}
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def quantize_tree_wint8(params, min_bytes: int = 1 << 20):
    """Walk a flax params tree; replace every 2D ``kernel`` leaf larger than
    ``min_bytes`` with ``kernel_q`` (int8) + ``scale`` (per-out-channel fp32).

    The consuming module must declare the matching wint8 params (see
    ``models/llama/modeling.py:MXUDense``). Embeddings, biases, norms and
    conv kernels (ndim != 2) are left untouched. TPU rationale: decode is
    weight-HBM-bandwidth-bound; int8 weights halve the bytes per token
    (reference counterpart: paddlenlp_ops weight-only int8 decode, SURVEY.md
    §2.4 item 6)."""
    # per-leaf jit with donation: the bf16 kernel's HBM is released as soon as
    # its int8 replacement exists, so peak memory is params + ONE weight, not
    # 1.5x the whole tree (a 7B model does not fit twice in 16 GB HBM)
    quant_one = jax.jit(quantize_weights_int8, donate_argnums=0)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict) and "kernel" in child \
                    and getattr(child["kernel"], "ndim", 0) == 2 \
                    and child["kernel"].size * 2 >= min_bytes:
                w = jnp.asarray(child["kernel"])
                q, scale = quant_one(w)
                jax.block_until_ready(q)
                if hasattr(w, "delete") and not w.is_deleted():
                    w.delete()  # some backends ignore donation; free explicitly
                rest = {k: v for k, v in child.items() if k != "kernel"}
                out[name] = {"kernel_q": q, "scale": scale, **walk(rest)}
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def quantizing_dot_general(lhs, rhs, dimension_numbers, precision=None,
                           preferred_element_type=None):
    """Drop-in ``lax.dot_general`` that runs the MXU int8 path (a8w8).

    Dynamic per-row activation scale x per-out-channel weight scale; the int8
    weight quantization is loop-invariant inside a jitted denoise fori_loop so
    XLA hoists it out and each step reads int8 weights only. Inject via
    ``nn.Dense(dot_general=...)``. Measured on v5e: 218 vs 162 TFLOP/s-equiv
    for the SDXL FF shapes. Falls back to the fp dot for non-Dense patterns."""
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb or tuple(lc) != (lhs.ndim - 1,) or tuple(rc) != (0,) or rhs.ndim != 2:
        return jax.lax.dot_general(lhs, rhs, dimension_numbers, precision=precision,
                                   preferred_element_type=preferred_element_type)
    amax = jnp.max(jnp.abs(lhs), axis=-1, keepdims=True)
    sx = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    wmax = jnp.max(jnp.abs(rhs), axis=0, keepdims=True)
    sw = jnp.maximum(wmax.astype(jnp.float32), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, dimension_numbers,
                              preferred_element_type=_int8_acc_dtype())
    return (acc.astype(jnp.float32) * sx * sw).astype(lhs.dtype)


def quantizing_conv_general_dilated(lhs, rhs, window_strides, padding,
                                    lhs_dilation=None, rhs_dilation=None,
                                    dimension_numbers=None,
                                    feature_group_count=1, batch_group_count=1,
                                    precision=None, preferred_element_type=None):
    """Drop-in ``lax.conv_general_dilated`` running int8 on the MXU (a8w8).

    Per-tensor activation scale, per-out-channel weight scale. Inject via
    ``nn.Conv(conv_general_dilated=...)``. Measured on v5e for the SDXL 3x3
    64x64x1280 conv: 187 vs 143 TFLOP/s-equiv."""
    kwargs = dict(window_strides=window_strides, padding=padding,
                  lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                  dimension_numbers=dimension_numbers,
                  feature_group_count=feature_group_count,
                  batch_group_count=batch_group_count, precision=precision)
    if feature_group_count != 1 or batch_group_count != 1:
        return jax.lax.conv_general_dilated(
            lhs, rhs, preferred_element_type=preferred_element_type, **kwargs)
    dn = dimension_numbers
    if not isinstance(dn, jax.lax.ConvDimensionNumbers):
        dn = jax.lax.conv_dimension_numbers(lhs.shape, rhs.shape, dn)
        kwargs["dimension_numbers"] = dn
    amax = jnp.max(jnp.abs(lhs))
    sx = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    o_axis = dn.rhs_spec[0]
    red = tuple(i for i in range(rhs.ndim) if i != o_axis)
    wmax = jnp.max(jnp.abs(rhs), axis=red, keepdims=True)
    sw = jnp.maximum(wmax.astype(jnp.float32), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, preferred_element_type=_int8_acc_dtype(), **kwargs)
    c_axis = dn.out_spec[1]
    sw_bshape = [1] * acc.ndim
    sw_bshape[c_axis] = acc.shape[c_axis]
    return (acc.astype(jnp.float32) * sx * sw.reshape(sw_bshape)).astype(lhs.dtype)


def np_prod(xs):
    out = 1
    for v in xs:
        out *= int(v)
    return out


def _int8_acc_dtype():
    """Accumulator dtype requested from int8 XLA dots/convs in the static
    a8w8 path. f32 (default) keeps the exact s32 MXU accumulation but converts
    in the op epilogue, so no raw s32 tensor is written to HBM; PMIX_INT8_S32=1
    restores the old behavior (s32 out + separate dequant fusion)."""
    import os
    return jnp.int32 if os.environ.get("PMIX_INT8_S32", "0") == "1" else jnp.float32


def _int8_backend(env_name: str) -> str:
    """Per-op-family int8 backend: PMIX_INT8_CONV / PMIX_INT8_MM = pallas|xla.

    Both default to xla. The Pallas int8 conv wins big in isolation
    (slope-timed 368 vs 165 TF/s at SDXL level-0 128x128 shapes) yet LOSES
    end-to-end: back-to-back SDXL-1024 runs measure xla 0.380 imgs/s,
    all-pallas 0.363, pallas-only-at-128x128 0.345 (reproducible to +-0.0001
    — the xla config re-measured 0.3801). The custom call breaks XLA's
    surrounding elementwise/conv fusions and layout choices in the resnet
    blocks, costing more than the kernel gains. Keep PMIX_INT8_CONV=pallas
    available for shapes/models where the trade flips."""
    import os
    return os.environ.get(env_name, "xla")


def _normalized_same_padding(padding, lhs_shape, rhs_shape, dn):
    """Classify conv padding: 'same3x3' for ((1,1),(1,1))/SAME on a 3x3,
    'valid1x1' for zero padding on a 1x1, else None."""
    kh_ax, kw_ax = dn.rhs_spec[2], dn.rhs_spec[3]
    kh, kw = rhs_shape[kh_ax], rhs_shape[kw_ax]
    if isinstance(padding, str):
        if padding.upper() == "SAME":
            return "same3x3" if (kh, kw) == (3, 3) else (
                "valid1x1" if (kh, kw) == (1, 1) else None)
        if padding.upper() == "VALID":
            return "valid1x1" if (kh, kw) == (1, 1) else None
        return None
    pad = tuple(tuple(int(v) for v in p) for p in padding)
    if pad == ((1, 1), (1, 1)) and (kh, kw) == (3, 3):
        return "same3x3"
    if pad == ((0, 0), (0, 0)) and (kh, kw) == (1, 1):
        return "valid1x1"
    return None


# --------------------------------------------------- static-scale a8w8 (PTQ)
# Call-order keyed static activation scales: flax traces a model's ops in a
# deterministic order, so a record-trace and an apply-trace of the SAME model
# visit the quantized ops in the same sequence. This sidesteps both the
# per-step amax reduces that make dynamic a8w8 a net loss (README measured
# negatives) and the minutes-long flax interception cost of
# ops/static_quant.py at SDXL scale. Reference counterpart: Paddle PTQ static
# quant passes feeding the deploy int8 path.
_STATIC_SCOPE = None


class static_a8w8_scope:
    """``with static_a8w8_scope("record") as ctx:`` — trace the model in fp,
    collecting per-call activation amax tracers in ``ctx.scales`` (return them
    from the jitted fn, e.g. ``jnp.stack(ctx.scales)``).

    ``with static_a8w8_scope("apply", scales):`` — trace again; each
    quantized op consumes the next scale in call order and runs int8."""

    def __init__(self, mode, scales=None):
        assert mode in ("record", "apply")
        self.mode = mode
        self.scales = [] if scales is None else list(scales)
        self.i = 0

    def __enter__(self):
        global _STATIC_SCOPE
        self._prev = _STATIC_SCOPE
        _STATIC_SCOPE = self
        return self

    def __exit__(self, *exc):
        global _STATIC_SCOPE
        _STATIC_SCOPE = self._prev
        return False

    def next_scale(self):
        s = self.scales[self.i]
        self.i += 1
        return s


def active_apply_scope():
    """The enclosing static_a8w8_scope when in apply mode, else None. Used by
    modules (e.g. the fused resnet block) that consume scales directly while
    preserving the record-trace call order."""
    ctx = _STATIC_SCOPE
    return ctx if ctx is not None and ctx.mode == "apply" else None


def _static_scale(raw):
    """Scale from the scope as a python float when possible (lets the Pallas
    kernels fold it as a compile-time constant), else None."""
    try:
        return max(float(raw), 1e-6) / 127.0
    except (TypeError, jax.errors.ConcretizationTypeError):
        return None


def static_quant_dot_general(lhs, rhs, dimension_numbers, precision=None,
                             preferred_element_type=None):
    """Like quantizing_dot_general but with call-order static activation
    scales from the enclosing static_a8w8_scope. Outside a scope (e.g. during
    module init) it is the plain fp dot."""
    ctx = _STATIC_SCOPE
    (lc, rc), (lb, rb) = dimension_numbers
    plain = (ctx is None or lb or rb or tuple(lc) != (lhs.ndim - 1,)
             or tuple(rc) != (0,) or rhs.ndim != 2)
    if plain or ctx.mode == "record":
        if not plain:
            ctx.scales.append(jnp.max(jnp.abs(lhs.astype(jnp.float32))))
        return jax.lax.dot_general(lhs, rhs, dimension_numbers,
                                   precision=precision,
                                   preferred_element_type=preferred_element_type)
    raw = ctx.next_scale()
    sxf = _static_scale(raw)
    if sxf is not None and _int8_backend("PMIX_INT8_MM") == "pallas":
        from .conv_int8 import int8_a8w8_matmul
        k, n = rhs.shape
        m = int(np_prod(lhs.shape[:-1]))
        if m % 8 == 0 and k % 128 == 0 and n % 128 == 0:
            return int8_a8w8_matmul(lhs, rhs, sxf)
    sx = jnp.maximum(jnp.asarray(raw, jnp.float32), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    wmax = jnp.max(jnp.abs(rhs.astype(jnp.float32)), axis=0, keepdims=True)
    sw = jnp.maximum(wmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    # f32-preferred output keeps the s32 accumulator in the MXU epilogue:
    # with preferred s32, XLA materializes raw s32[.., N] accumulators to HBM
    # (2x the bytes of bf16) and dequants in a separate loop fusion — the
    # a8w8 step profile attributes ~24 ms/step to those chains. The MXU still
    # accumulates exact s32; only the convert moves inside the op.
    acc = jax.lax.dot_general(xq, wq, dimension_numbers,
                              preferred_element_type=_int8_acc_dtype())
    return (acc.astype(jnp.float32) * sx * sw).astype(lhs.dtype)


def static_quant_conv_general_dilated(lhs, rhs, window_strides, padding,
                                      lhs_dilation=None, rhs_dilation=None,
                                      dimension_numbers=None,
                                      feature_group_count=1, batch_group_count=1,
                                      precision=None, preferred_element_type=None):
    ctx = _STATIC_SCOPE
    kwargs = dict(window_strides=window_strides, padding=padding,
                  lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                  dimension_numbers=dimension_numbers,
                  feature_group_count=feature_group_count,
                  batch_group_count=batch_group_count, precision=precision)
    plain = ctx is None or feature_group_count != 1 or batch_group_count != 1
    if plain or ctx.mode == "record":
        if not plain:
            ctx.scales.append(jnp.max(jnp.abs(lhs.astype(jnp.float32))))
        return jax.lax.conv_general_dilated(
            lhs, rhs, preferred_element_type=preferred_element_type, **kwargs)
    dn = dimension_numbers
    if not isinstance(dn, jax.lax.ConvDimensionNumbers):
        dn = jax.lax.conv_dimension_numbers(lhs.shape, rhs.shape, dn)
        kwargs["dimension_numbers"] = dn
    raw = ctx.next_scale()
    sxf = _static_scale(raw)
    if sxf is not None and use_pallas() \
            and _int8_backend("PMIX_INT8_CONV") == "pallas":
        from .conv_int8 import conv3x3_supported, int8_conv3x3_same
        pad = _normalized_same_padding(padding, lhs.shape, rhs.shape, dn)
        # Measured v5e dispatch (tools/profile_convs.py, slope-timed): the
        # Pallas conv wins only at large spatial extent — 128x128 SDXL
        # level-0 shapes run 368/282 TF/s vs XLA int8's 165/146, but at
        # 64x64 and 32x32 XLA int8 reaches 240-300 TF/s and the Pallas
        # per-block overheads lose (135-185 TF/s). 1x1 convs stay on XLA
        # int8 dots for the same reason.
        hw = lhs.shape[dn.lhs_spec[2]] * lhs.shape[dn.lhs_spec[3]]
        import os as _os
        min_hw = int(_os.environ.get("PMIX_INT8_CONV_PALLAS_MIN_HW", 16384))
        if pad == "same3x3" and hw >= min_hw and conv3x3_supported(
                lhs.shape, rhs.shape, window_strides,
                lhs_dilation, rhs_dilation, dn):
            return int8_conv3x3_same(lhs, rhs, sxf)
    sx = jnp.maximum(jnp.asarray(raw, jnp.float32), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    o_axis = dn.rhs_spec[0]
    red = tuple(i for i in range(rhs.ndim) if i != o_axis)
    wmax = jnp.max(jnp.abs(rhs.astype(jnp.float32)), axis=red, keepdims=True)
    sw = jnp.maximum(wmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, preferred_element_type=_int8_acc_dtype(), **kwargs)
    c_axis = dn.out_spec[1]
    sw_bshape = [1] * acc.ndim
    sw_bshape[c_axis] = acc.shape[c_axis]
    return (acc.astype(jnp.float32) * sx * sw.reshape(sw_bshape)).astype(lhs.dtype)


def wint8_matmul_xla(x, wq, scale):
    out = jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (out * scale).astype(x.dtype)


def _wint8_kernel(x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = wq_ref[...].astype(jnp.bfloat16)  # dequant-on-the-fly (int8 -> bf16)
    acc_ref[...] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def wint8_matmul(x, wq, scale, *, block_m: int = 256, block_n: int = 256, block_k: int = 512):
    """x: (..., K) @ wq: (K, N) int8, scale: (N,) -> (..., N)."""
    orig_shape = x.shape
    k, n = wq.shape
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]
    if not use_pallas() or m % 8 != 0 or k % 128 != 0 or n % 128 != 0:
        return wint8_matmul_xla(x2d, wq, scale).reshape(*orig_shape[:-1], n)
    bm = min(block_m, m)
    while m % bm:
        bm //= 2
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    bk = min(block_k, k)
    while k % bk:
        bk //= 2
    out = pl.pallas_call(
        functools.partial(_wint8_kernel, n_k=k // bk),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(x2d.astype(jnp.bfloat16), wq, scale[None, :])
    return out.reshape(*orig_shape[:-1], n)
