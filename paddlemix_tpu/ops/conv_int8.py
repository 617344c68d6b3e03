"""Pallas int8 a8w8 convolution + matmul kernels for the static-PTQ path.

TPU rationale: XLA lowers int8 convs on v5e at only ~1.35x bf16 (measured,
README "measured negatives") — it im2cols through fp paths instead of feeding
the native int8 MXU (which is 2x bf16 rate). These kernels do the conv as nine
shifted int8 matmuls with int32 accumulation directly on the MXU and fuse the
dequantize into the epilogue, the same recipe that made ``wint8_matmul`` work.

Reference counterpart: the Paddle-TRT int8 deploy path
(/root/reference/ppdiffusers/deploy/README.md) and the triton weight-only
kernels (/root/reference/paddlemix/triton_ops/triton_ops.py:464). This is not
a translation: the reference relies on TensorRT's int8 conv engine; here the
kernel is built from TPU primitives (flattened-image taps so every matmul
operand is DMA-aligned, scales folded at trace time by ``static_a8w8_scope``).

Layout trick: pad the image to (H+2, W+2) and flatten to ((H+2)*(W+2), C).
Output pixel (h, w) with tap (dh, dw) reads flat row (h+dh)*(W+2) + (w+dw):
for a block of BH output rows every tap is ONE contiguous flat slice, so nine
DMAs land nine perfectly aligned (BH*(W+2), C) operands in VMEM — no sublane
shifts in the compute loop. Outputs are produced on the padded-width grid
(W+2) and the two garbage columns per row are sliced off afterwards by XLA
(cheap vs. MXU time; verified by microbenchmark).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode, use_pallas


def _quantize_int8(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)),
                    -127, 127).astype(jnp.int8)


def quantize_weight_per_cout(w):
    """w: (..., O) fp -> (int8 w, (O,) f32 scales). Loop-invariant under jit:
    XLA hoists it out of the denoise fori_loop so steps read int8 only."""
    red = tuple(range(w.ndim - 1))
    wmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red)
    sw = jnp.maximum(wmax, 1e-8) / 127.0
    wq = _quantize_int8(w, sw)
    return wq, sw


# ------------------------------------------------------------- conv 3x3 s1
def _conv3x3_kernel(x_hbm, w_ref, sw_ref, o_ref, src_vmem, taps_vmem, sem, *,
                    bh, w2, c, bhw, src_rows, sx, out_dtype):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    oi = pl.program_id(2)

    @pl.when(oi == 0)
    def _load():
        # HBM slice starts must be sublane-tile aligned: hi*bh*w2 is a
        # multiple of 8 by construction (bh even, w2 even). The 9 per-tap
        # views are then cut in VMEM (sublane shifts), ONCE per row block,
        # amortized over all output-channel blocks.
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(hi * bh * w2, src_rows), :], src_vmem, sem)
        cp.start()
        cp.wait()
        for tap in range(9):
            dh, dw = divmod(tap, 3)
            taps_vmem[tap] = src_vmem[pl.ds(dh * w2 + dw, bhw), :]

    acc = None
    for tap in range(9):
        d = jax.lax.dot(taps_vmem[tap], w_ref[pl.ds(tap * c, c), :],
                        preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    scale = sw_ref[0, :].astype(jnp.float32) * sx
    o_ref[0] = (acc.astype(jnp.float32) * scale[None, :]).astype(out_dtype)


def _select_blocks(h, w2, c, o, block_h=None, block_o=256):
    """Pick (bh, bo) such that the output block (bh*w2, bo) meets Mosaic's
    (8, 128) tile alignment, divides (h, o), and fits the VMEM budget.
    Returns None when no legal configuration exists (caller falls back)."""
    import math

    def vmem_est(bh_, bo_):
        bhw_ = bh_ * w2
        return (10 * bhw_ * c + (bh_ + 2) * w2 * c  # taps + src (int8)
                + 9 * c * bo_                        # weight block (int8)
                + bhw_ * bo_ * 6)                    # acc i32 + out bf16

    # bh*w2 % 8 == 0 (sublane tile): with W%8==0, w2 ≡ 2 (mod 8) so min_bh=4
    min_bh = 8 // math.gcd(w2, 8)
    bhs = [bh_ for bh_ in (32, 16, 8, 4, 2, 1)
           if bh_ % min_bh == 0 and h % bh_ == 0
           and (block_h is None or bh_ <= block_h)]
    bos = [bo_ for bo_ in (512, 256, 128)
           if bo_ <= min(block_o, o) and o % bo_ == 0]
    for bh_ in bhs:
        for bo_ in bos:
            if vmem_est(bh_, bo_) <= 10 << 20:
                return bh_, bo_
    return None


def int8_conv3x3_same(x, w, sx, *, block_h: int | None = None,
                      block_o: int = 256):
    """3x3 stride-1 SAME conv, NHWC x (B,H,W,C) fp, w (3,3,C,O) fp, static
    activation scale ``sx`` (python float, absmax/127). Returns (B,H,W,O) in
    x.dtype. Weights are int8-quantized per-output-channel inside (hoisted by
    XLA when loop-invariant)."""
    b, h, wd, c = x.shape
    o = w.shape[-1]
    w2 = wd + 2

    blocks = _select_blocks(h, w2, c, o, block_h, block_o)
    if blocks is None:
        # no aligned block configuration fits VMEM: 9 shifted int8 XLA dots
        xq = _quantize_int8(x, sx)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        wq, sw = quantize_weight_per_cout(w)
        acc = None
        for tap in range(9):
            dh, dw = divmod(tap, 3)
            d = jax.lax.dot_general(
                xp[:, dh:dh + h, dw:dw + wd, :], wq[dh, dw],
                (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        return (acc.astype(jnp.float32)
                * (sw.astype(jnp.float32) * float(sx))).astype(x.dtype)
    bh, bo = blocks
    bhw = bh * w2

    src_rows = -(-((bh + 2) * w2 + 2) // 8) * 8

    xq = _quantize_int8(x, sx)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xq.reshape(b, (h + 2) * w2, c)
    # the last row block's source window extends past the flat image
    flat = jnp.pad(flat, ((0, 0), (0, src_rows - 2 * w2), (0, 0)))
    wq, sw = quantize_weight_per_cout(w)
    w9 = wq.reshape(9 * c, o)

    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, bh=bh, w2=w2, c=c, bhw=bhw,
                          src_rows=src_rows, sx=float(sx), out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((b, h * w2, o), x.dtype),
        grid=(b, h // bh, o // bo),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * c, bo), lambda bb, hh, oo: (0, oo)),
            pl.BlockSpec((1, bo), lambda bb, hh, oo: (0, oo)),
        ],
        out_specs=pl.BlockSpec((1, bhw, bo), lambda bb, hh, oo: (bb, hh, oo)),
        scratch_shapes=[
            pltpu.VMEM((src_rows, c), jnp.int8),
            pltpu.VMEM((9, bhw, c), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(flat, w9, sw[None, :])
    return out.reshape(b, h, w2, o)[:, :, :wd, :]


# ------------------------------------------------------------ a8w8 matmul
def _a8w8_kernel(x_ref, wq_ref, sw_ref, o_ref, acc_ref, *, n_k, sx, out_dtype):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(x_ref[...], wq_ref[...],
                                preferred_element_type=jnp.int32)

    @pl.when(ki == n_k - 1)
    def _store():
        scale = sw_ref[...].astype(jnp.float32) * sx
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * scale).astype(out_dtype)


def int8_a8w8_matmul(x, w, sx, *, block_m: int = 512, block_n: int = 512,
                     block_k: int = 512):
    """x: (..., K) fp @ w: (K, N) fp with static activation scale sx.
    Both sides int8 on the MXU, int32 accumulation, fused dequant epilogue."""
    orig_shape = x.shape
    k, n = w.shape
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]
    xq = _quantize_int8(x2d, sx)
    wq, sw = quantize_weight_per_cout(w)
    if (not use_pallas()) or m % 8 or k % 128 or n % 128:
        acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) * (sw[None, :] * sx)).astype(x.dtype)
        return out.reshape(*orig_shape[:-1], n)
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
        functools.partial(_a8w8_kernel, n_k=k // bk, sx=float(sx),
                          out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(xq, wq, sw[None, :])
    return out.reshape(*orig_shape[:-1], n)


def conv3x3_supported(lhs_shape, rhs_shape, window_strides, lhs_dilation,
                      rhs_dilation, dn) -> bool:
    """True when the Pallas 3x3 path handles this conv: NHWC/HWIO, stride 1,
    no dilation, SAME padding is checked by the caller, C and O MXU-worthy."""
    if tuple(window_strides) != (1, 1):
        return False
    if lhs_dilation is not None and tuple(lhs_dilation) != (1, 1):
        return False
    if rhs_dilation is not None and tuple(rhs_dilation) != (1, 1):
        return False
    if dn.lhs_spec != (0, 3, 1, 2) or dn.rhs_spec != (3, 2, 0, 1) \
            or dn.out_spec != (0, 3, 1, 2):
        return False  # not NHWC x HWIO -> NHWC
    kh, kw, c, o = rhs_shape
    if (kh, kw) != (3, 3):
        return False
    if c % 128 or o % 128 or c < 128 or o < 128:
        return False
    return lhs_shape[2] % 8 == 0  # W multiple of 8 keeps flat blocks aligned
