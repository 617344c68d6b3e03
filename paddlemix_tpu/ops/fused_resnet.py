"""Fused GroupNorm+SiLU+int8-conv3x3 Pallas kernel — the SDXL resnet hot path.

Round-3 finding (README "Status / roadmap"): a standalone Pallas int8 conv
slope-times 368 TF/s vs XLA int8's 165 at SDXL level-0 shapes yet LOSES
end-to-end, because the lone custom call breaks XLA's elementwise/layout
fusions inside the resnet block. This kernel moves the fusion boundary to the
whole block: GroupNorm affine + SiLU + int8 quantize happen in VMEM on the
conv's own source rows, and conv bias + time-embedding + residual add fuse
into the dequant epilogue. Between two of these calls only tiny (B,C)-sized
XLA ops remain (the GroupNorm moments), so there is nothing left for a
custom-call boundary to de-optimize.

The reference counterpart is the Paddle-TRT int8 deploy engine
(/root/reference/ppdiffusers/deploy/README.md) + CUDA fused_ln
(/root/reference/paddlemix/external_ops/); this is not a translation — the
layout recipe (flattened padded image so all nine taps are contiguous slices)
comes from ops/conv_int8.py and the moments/affine split keeps the global
GroupNorm reduction in XLA where it fuses with the producer for free.

Round-5 end-to-end verdict (measured, v5e, SDXL-1024 a8w8-static driver
bench): PMIX_FUSED_RESNET=1 LOSES — 0.3158 vs 0.4296 imgs/s; step 89.5 ->
108.2 ms and the VAE-dominated fixed cost 91 -> 461 ms. Moving the fusion
boundary to the whole block still denies XLA its cross-block layout choices,
and the VAE decoder's large-spatial/low-channel resnets are hit hardest.
Same economics as the bare Pallas int8 conv (ops/quant.py note): the kernel
wins in isolation, the custom-call boundary loses the program. Default stays
XLA; the kernel + this measurement stay in-tree so it isn't retried blindly.

Structure per call (one per resnet conv):
  XLA:    s, s2 = moments(x)  (tiny (B,C) f32; fuses into x's producer)
          scale/shift = affine(gamma, beta, s, s2)       # (B, 2, C)
          bias_eff = conv_bias [+ time_emb]              # (B, O)
  Pallas: grid (B, H/bh, O/bo); at oi==0 DMA the padded src window, apply
          scale/shift + SiLU + static-scale int8 quantize + border mask in
          VMEM, cut the nine tap views; per oi: nine int8 MXU dots with int32
          accumulation, dequant + bias + residual epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_int8 import _quantize_int8, quantize_weight_per_cout
from .dispatch import interpret_mode, use_pallas


def gn_affine(x, gamma, beta, groups: int, eps: float):
    """Per-(batch, channel) GroupNorm scale/shift from one fused XLA pass.

    Returns (B, 2, C) f32: out = x * a[:, 0] + a[:, 1]. The moments reduce is
    the only full read of x outside the kernel and XLA fuses it into x's
    producer."""
    b, c = x.shape[0], x.shape[-1]
    cpg = c // groups
    red = tuple(range(1, x.ndim - 1))
    n = float(np.prod(x.shape[1:-1]) * cpg)
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=red)                   # (B, C)
    s2 = jnp.sum(xf * xf, axis=red)             # (B, C)
    gs = s.reshape(b, groups, cpg).sum(-1)
    gs2 = s2.reshape(b, groups, cpg).sum(-1)
    mean = gs / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=-1)
    inv_c = jnp.repeat(inv, cpg, axis=-1)
    scale = inv_c * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean_c * scale
    return jnp.stack([scale, shift], axis=1)    # (B, 2, C)


def _kernel(x_hbm, aff_ref, wq_ref, sw_ref, bias_ref, *rest, bh, w2, c, bhw,
            src_rows, sx, h_img, wd, has_res, out_dtype):
    if has_res:
        res_ref, o_ref, src_vmem, sem = rest
    else:
        o_ref, src_vmem, sem = rest
    b = pl.program_id(0)
    hi = pl.program_id(2)

    # grid is (B, n_o, n_h) — output-channel stripe OUTER so each weight
    # stripe stays VMEM-resident across the whole image traversal (the
    # re-read of src per stripe is n_o * image bytes, far cheaper than
    # re-fetching 9*C*bo weights per row block)
    cp_dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(hi * bh * w2, src_rows), :], src_vmem, sem)
    cp_dma.start()
    cp_dma.wait()
    x = src_vmem[...].astype(jnp.float32)                # (src_rows, C)
    scale = aff_ref[0, 0, :].astype(jnp.float32)[None, :]
    shift = aff_ref[0, 1, :].astype(jnp.float32)[None, :]
    y = x * scale + shift
    y = y * jax.nn.sigmoid(y)
    q = jnp.clip(jnp.round(y * (1.0 / sx)), -127, 127).astype(jnp.int8)
    # zero the conv's SAME border: padded-flat row g is interior iff it
    # lies in [w2, (H+1)*w2) and its column (g % w2) is in [1, wd]
    g = hi * bh * w2 + jax.lax.broadcasted_iota(
        jnp.int32, (src_rows, 1), 0)
    col = g % w2
    interior = ((g >= w2) & (g < (h_img + 1) * w2)
                & (col >= 1) & (col <= wd))
    q = jnp.where(interior, q, jnp.int8(0))

    acc = None
    for tap in range(9):
        dh, dw = divmod(tap, 3)
        d = jax.lax.dot(q[dh * w2 + dw:dh * w2 + dw + bhw, :],
                        wq_ref[pl.ds(tap * c, c), :],
                        preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    deq = sw_ref[0, :].astype(jnp.float32) * sx
    out = acc.astype(jnp.float32) * deq[None, :] + bias_ref[0, 0, :][None, :]
    if has_res:
        r = res_ref[0].astype(jnp.float32)               # (bh, wd, bo)
        r = jnp.pad(r, ((0, 0), (0, w2 - wd), (0, 0)))
        out = out + r.reshape(bhw, -1)
    o_ref[0] = out.astype(out_dtype)


def _select_blocks(h, w2, c, o):
    """(bh, bo): prefer the WIDEST output stripe (feeds the MXU fat K*N
    passes and keeps the weight stripe resident across the image), then the
    tallest row block that fits VMEM. bh*w2 must be sublane-aligned and
    divide h; bo must divide o (o itself is allowed for non-power-of-two
    widths like SDXL's 320)."""
    import math

    def vmem_est(bh_, bo_):
        bhw_ = bh_ * w2
        src = -(-((bh_ + 2) * w2 + 2) // 8) * 8
        return (src * c * 3            # src bf16 scratch + int8 q value
                + 2 * 9 * c * bo_      # weight stripe (double-buffered)
                + bhw_ * c             # one sliced tap operand
                + bhw_ * bo_ * 4       # int32 accumulator
                + 2 * bhw_ * bo_ * 4)  # out + residual blocks (dbl-buffered)

    min_bh = 8 // math.gcd(w2, 8)
    bhs = [bh_ for bh_ in (32, 16, 8, 4, 2, 1)
           if bh_ % min_bh == 0 and h % bh_ == 0]
    bos = [bo_ for bo_ in (1280, 1024, 640, 512, 384, 256, 128)
           if bo_ <= o and o % bo_ == 0]
    if o <= 1280 and o not in bos:
        bos.insert(0, o)
    for bo_ in bos:
        for bh_ in bhs:
            if vmem_est(bh_, bo_) <= 12 << 20:
                return bh_, bo_
    return None


def fused_supported(x_shape, w_shape) -> bool:
    """NHWC x (3,3,C,O), stride-1 SAME, lane-tileable channels, W mult of 8."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, h, wd, c = x_shape
    kh, kw, wc, o = w_shape
    if (kh, kw) != (3, 3) or wc != c:
        return False
    if c % 32 or o % 32 or c < 128 or o < 128:
        return False
    if wd % 8 or h % 2:
        return False
    return _select_blocks(h, wd + 2, -(-c // 128) * 128, o) is not None


def fused_gn_silu_conv3x3_ref(x, gamma, beta, groups, eps, w, b, sx,
                              temb=None, residual=None):
    """XLA reference composition with IDENTICAL quantization math (used as
    fallback and by the parity tests)."""
    aff = gn_affine(x, gamma, beta, groups, eps)
    scale = aff[:, 0][:, None, None, :]
    shift = aff[:, 1][:, None, None, :]
    y = x.astype(jnp.float32) * scale + shift
    y = y * jax.nn.sigmoid(y)
    xq = _quantize_int8(y, sx)
    wq, sw = quantize_weight_per_cout(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sw.astype(jnp.float32) * float(sx))
    out = out + b.astype(jnp.float32)[None, None, None, :]
    if temb is not None:
        out = out + temb.astype(jnp.float32)[:, None, None, :]
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


def fused_gn_silu_conv3x3(x, gamma, beta, groups, eps, w, b, sx,
                          temb=None, residual=None):
    """GroupNorm(groups, eps; gamma, beta) -> SiLU -> int8 conv3x3 SAME with
    static activation scale ``sx`` -> +bias [+temb] [+residual].

    x: (B, H, W, C) bf16/f32; w: (3, 3, C, O) fp; b: (O,);
    temb: (B, O) or None; residual: (B, H, W, O) or None.
    """
    if not (use_pallas() and fused_supported(x.shape, w.shape)):
        return fused_gn_silu_conv3x3_ref(x, gamma, beta, groups, eps, w, b,
                                         sx, temb, residual)
    bsz, h, wd, c = x.shape
    o = w.shape[-1]
    w2 = wd + 2
    # lane-pad channels to the 128 tile: Mosaic requires the manual HBM->VMEM
    # DMA's lane extent 128-aligned (measured on-chip: C=320 is rejected,
    # "Slice shape along dimension 2 must be aligned to tiling"). Zero-padded
    # channels get scale=shift=0 from the padded affine, so they quantize to
    # int8 zero and contribute nothing to the taps' dot products.
    cp = -(-c // 128) * 128
    bh, bo = _select_blocks(h, w2, cp, o)
    bhw = bh * w2
    src_rows = -(-((bh + 2) * w2 + 2) // 8) * 8

    aff = gn_affine(x, gamma, beta, groups, eps)
    aff = jnp.pad(aff, ((0, 0), (0, 0), (0, cp - c)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, cp - c)))
    flat = xp.reshape(bsz, (h + 2) * w2, cp)
    flat = jnp.pad(flat, ((0, 0), (0, max(0, src_rows - 2 * w2)), (0, 0)))
    wq, sw = quantize_weight_per_cout(w)          # hoisted when loop-invariant
    wq = jnp.pad(wq, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    w9 = wq.reshape(9 * cp, o)
    bias_eff = b.astype(jnp.float32)[None, :] + (
        temb.astype(jnp.float32) if temb is not None
        else jnp.zeros((1, o), jnp.float32))
    bias_eff = jnp.broadcast_to(bias_eff, (bsz, o))

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 2, cp), lambda bb, oo, hh: (bb, 0, 0)),
        pl.BlockSpec((9 * cp, bo), lambda bb, oo, hh: (0, oo)),
        pl.BlockSpec((1, bo), lambda bb, oo, hh: (0, oo)),
        # bias as (B, 1, O): Mosaic needs the (sub)lane block dims divisible
        # by (8, 128) or equal to the array dims — a (1, bo) block over
        # (B, O) violates the sublane rule when B > 1
        pl.BlockSpec((1, 1, bo), lambda bb, oo, hh: (bb, 0, oo)),
    ]
    operands = [flat, aff, w9, sw[None, :], bias_eff[:, None, :]]
    has_res = residual is not None
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, bh, wd, bo), lambda bb, oo, hh: (bb, hh, 0, oo)))
        operands.append(residual)

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w2=w2, c=cp, bhw=bhw,
                          src_rows=src_rows, sx=float(sx), h_img=h, wd=wd,
                          has_res=has_res, out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((bsz, h * w2, o), x.dtype),
        grid=(bsz, o // bo, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bhw, bo), lambda bb, oo, hh: (bb, hh, oo)),
        scratch_shapes=[
            pltpu.VMEM((src_rows, cp), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(*operands)
    return out.reshape(bsz, h, w2, o)[:, :, :wd, :]
