"""Attention: Pallas flash kernels + XLA math reference + backend dispatch.

TPU-native replacement for the reference's attention stack:
 - SDPA backend dispatch (reference ppdiffusers/patches/paddle_patch.py:414-530:
   math / cutlass / varlen / flash selected by dtype+env) -> here pallas-vs-XLA
   chosen by platform/shape with env overrides.
 - Paddle flash-attention + varlen flash_attn_unpadded (reference
   paddlemix/models/flash_attn_utils.py:6-27, qwen2_vl/modeling_qwen2_vl.py:710-812)
   -> one flash kernel with segment-id masking (packing and varlen become
   segment ids on TPU: no unpad/pad round-trips, shapes stay static).

Layout convention: q/k/v are (batch, seq, num_heads, head_dim) (flax style).
GQA/MQA supported (kv heads may divide q heads).

Forward + backward are custom Pallas kernels (flash fwd; dkv + dq bwd) with
an lse-based residual, mirroring the structure of the reference's fused CUDA
attention but tiled for MXU/VMEM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode, use_pallas

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LANES = 128


class SegmentIds(NamedTuple):
    q: jnp.ndarray  # (B, Sq) int32
    kv: jnp.ndarray  # (B, Skv) int32


# ============================================================ XLA reference
def attention_xla(
    q, k, v, *, bias=None, causal=False, segment_ids: Optional[SegmentIds] = None,
    scale: Optional[float] = None, dropout_rate: float = 0.0, dropout_rng=None,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    """Math attention. q: (B,Sq,Hq,D), k/v: (B,Skv,Hkv,D). Returns (B,Sq,Hq,D)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    scale = (d ** -0.5) if scale is None else scale
    if hkv != hq:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((sq, skv), dtype=bool), k=skv - sq)[None, None]
    if segment_ids is not None:
        seg = (segment_ids.q[:, :, None] == segment_ids.kv[:, None, :])[:, None]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        logits = jnp.where(mask, logits, mask_value)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


# ============================================================ Pallas forward
# Scores are computed in base-2 log space: the wrapper folds scale*log2(e)
# into q, so the kernel runs exp2 (one fewer VPU pass over the s tile than
# scale-then-exp) and the lse residual is m2 + log2(l).
LOG2E = float(np.log2(np.e))


def _fwd_kernel(q_ref, k_ref, v_ref, *args,
                causal, block_q, block_k, num_kv, has_segments, mask_value,
                d_out, fuse_l, want_lse, int8_qk=False):
    # inference calls drop the lse output entirely (a pallas output is always
    # written; (B,H,S,128-lane) fp32 lse is ~2GB/step of dead HBM traffic on
    # the SDXL UNet) — rest is (lse_ref?, m_scr, l_scr, acc_scr)
    if int8_qk:
        sq_ref, sk_ref, qseg_ref, kseg_ref, o_ref, *rest = args
    else:
        qseg_ref, kseg_ref, o_ref, *rest = args
    lse_ref = rest[0] if want_lse else None
    m_scr, l_scr, acc_scr = rest[1:] if want_lse else rest
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        if not fuse_l:
            l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = True
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(should_run)
    def _run():
        if int8_qk:
            # int8 QK^T: the D=64 contraction caps bf16 at ~half MXU rate;
            # int8 doubles the lane rate. Per-row dynamic scales (sq folds
            # scale*log2(e)) dequantize the int32 logits on the VPU.
            s32 = jax.lax.dot_general(
                q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = s32.astype(jnp.float32) * sq_ref[0, 0] * sk_ref[0, 0]
        else:
            # operands stay in their storage dtype: MXU multiplies bf16
            # natively with fp32 accumulation; upcasting first would run the
            # matmul at the ~8x slower fp32 MXU rate. q is pre-scaled by
            # scale*log2(e).
            s = jax.lax.dot_general(
                q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, block_k) fp32, base-2 logits

        if causal or has_segments:
            mask = jnp.full(s.shape, True)
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
                mask = mask & (cols <= rows)
            if has_segments:
                qs = qseg_ref[0, 0]  # (block_q,)
                ks = kseg_ref[0, 0]  # (block_k,)
                mask = mask & (qs[:, None] == ks[None, :])
            s = jnp.where(mask, s, mask_value)

        m_prev = m_scr[...]  # (block_q, LANES)
        m_curr = jnp.max(s, axis=1)[:, None]  # (block_q, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])  # (block_q, 1)
        p = jnp.exp2(s - m_next[:, :1])
        m_scr[...] = m_next
        if not fuse_l:
            l_scr[...] = jnp.broadcast_to(
                alpha * l_scr[:, :1] + jnp.sum(p, axis=1)[:, None], l_scr.shape)
        # when fuse_l, v carries a trailing ones column so acc[:, d_out]
        # accumulates sum(p) on the MXU instead of a VPU reduction
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_kv - 1)
    def _store():
        l = acc_scr[:, d_out:d_out + 1] if fuse_l else l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[:, :d_out] * l_inv).astype(o_ref.dtype)
        if want_lse:
            m = m_scr[:, :1]
            lse = m + jnp.log2(jnp.where(l == 0.0, 1.0, l))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_fwd(q, k, v, segment_ids, scale, causal, block_q, block_k, mask_value,
               want_lse=True, int8_qk=False):
    """q: (B,Hq,Sq,D), k/v: (B,Hkv,Skv,D) -> o, lse(B,Hq,Sq,LANES fp32 base-2).

    want_lse=False (inference) drops the lse output and its HBM writes; the
    return is then (o, None). int8_qk quantizes q/k per row and runs the
    QK^T contraction on the int8 MXU path (2x the bf16 lane rate — the win
    that matters at D=64 where the 64-deep contraction idles half the MXU);
    PV stays bf16 (it contracts over block_k, already full-rate)."""
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    g = hq // hkv
    nq, nk = sq // block_q, skv // block_k
    has_segments = segment_ids is not None
    if has_segments:
        qseg = segment_ids.q.astype(jnp.int32)[:, None, :]
        kseg = segment_ids.kv.astype(jnp.int32)[:, None, :]
    else:
        qseg = jnp.zeros((b, 1, sq), jnp.int32)
        kseg = jnp.zeros((b, 1, skv), jnp.int32)

    if int8_qk:
        # per-row symmetric int8; scale*log2(e) folds into the q scales so
        # the kernel's logits stay base-2. Scale layouts are 4D with the
        # broadcast axis LAST (sq) / SECOND-TO-LAST (sk): Mosaic constrains
        # only the last two block dims, and these land as (block_q, 1) /
        # (1, block_k) tiles already shaped for the s dequant broadcast.
        qa = jnp.maximum(jnp.max(jnp.abs(q.astype(jnp.float32)), -1), 1e-9)
        sq_arr = ((qa / 127.0) * (scale * LOG2E))[..., None]  # (B,Hq,Sq,1)
        q = jnp.clip(jnp.round(q.astype(jnp.float32) * (127.0 / qa[..., None])),
                     -127, 127).astype(jnp.int8)
        ka = jnp.maximum(jnp.max(jnp.abs(k.astype(jnp.float32)), -1), 1e-9)
        sk_arr = (ka / 127.0)[:, :, None, :]                  # (B,Hkv,1,Skv)
        k = jnp.clip(jnp.round(k.astype(jnp.float32) * (127.0 / ka[..., None])),
                     -127, 127).astype(jnp.int8)
    else:
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    v = v.reshape(b, hkv, skv, d)
    k = k.reshape(b, hkv, skv, d)
    # the ones-column is free when d leaves lane padding anyway (e.g. 64);
    # at d % 128 == 0 it would double the PV matmul width, so skip it there
    fuse_l = d % LANES != 0
    dv_in = d + 1 if fuse_l else d
    if fuse_l:
        v = jnp.concatenate([v, jnp.ones((b, hkv, skv, 1), v.dtype)], axis=-1)

    grid = (b, hq, nq, nk)
    kernel = functools.partial(
        _fwd_kernel, causal=causal, block_q=block_q, block_k=block_k,
        num_kv=nk, has_segments=has_segments, mask_value=mask_value,
        d_out=d, fuse_l=fuse_l, want_lse=want_lse, int8_qk=int8_qk,
    )
    out_shape = [jax.ShapeDtypeStruct((b, hq, sq, d), v.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), lambda bb, h, qi, ki: (bb, h, qi, 0))]
    if want_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, hq, sq, LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, block_q, LANES), lambda bb, h, qi, ki: (bb, h, qi, 0)))
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bb, h, qi, ki: (bb, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bb, h, qi, ki: (bb, h // g, ki, 0)),
        pl.BlockSpec((1, 1, block_k, dv_in), lambda bb, h, qi, ki: (bb, h // g, ki, 0)),
    ]
    inputs = [q, k, v]
    if int8_qk:
        in_specs += [
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, h, qi, ki: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_k), lambda bb, h, qi, ki: (bb, h // g, 0, ki)),
        ]
        inputs += [sq_arr, sk_arr]
    in_specs += [
        pl.BlockSpec((1, 1, block_q), lambda bb, h, qi, ki: (bb, 0, qi)),
        pl.BlockSpec((1, 1, block_k), lambda bb, h, qi, ki: (bb, 0, ki)),
    ]
    inputs += [qseg, kseg]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dv_in), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(*inputs)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


# ============================================================ Pallas backward
def _bwd_dkv_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref,
                    di_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal,
                    block_q, block_k, num_q, has_segments, mask_value):
    # q arrives pre-scaled by scale*log2(e); lse is base-2 (matches fwd).
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = True
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]   # (bq, d) storage dtype: bf16 matmuls, fp32 accum
        kk = k_ref[0, 0]  # (bk, d)
        vv = v_ref[0, 0]
        do = do_ref[0, 0]  # (bq, d)
        lse = lse_ref[0, 0][:, :1]            # (bq, 1)
        di = di_ref[0, 0][:, :1]              # (bq, 1)

        s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # base-2
        if causal or has_segments:
            mask = jnp.full(s.shape, True)
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
                mask = mask & (cols <= rows)
            if has_segments:
                mask = mask & (qseg_ref[0, 0][:, None] == kseg_ref[0, 0][None, :])
            s = jnp.where(mask, s, mask_value)
        p = jnp.exp2(s - lse)  # (bq, bk) fp32
        # dv += p^T do (p demoted to the storage dtype so the MXU runs bf16)
        dv_scr[...] += jax.lax.dot_general(p.astype(do.dtype), do,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        # dp = do v^T ; ds = p * (dp - di)
        dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dk = scale * ds^T q_orig = ds^T q_scaled / log2(e)
        ds = p * (dp - di) * (1.0 / LOG2E)
        dk_scr[...] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(qi == num_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref,
                   di_ref, dq_ref, dq_scr, *, scale, causal, block_q, block_k,
                   num_kv, has_segments, mask_value):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = True
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        kk = k_ref[0, 0]
        vv = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]
        s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # base-2
        if causal or has_segments:
            mask = jnp.full(s.shape, True)
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
                mask = mask & (cols <= rows)
            if has_segments:
                mask = mask & (qseg_ref[0, 0][:, None] == kseg_ref[0, 0][None, :])
            s = jnp.where(mask, s, mask_value)
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - di) * scale  # dq w.r.t. the ORIGINAL (unscaled) q
        dq_scr[...] += jax.lax.dot(ds.astype(kk.dtype), kk,
                                   preferred_element_type=jnp.float32)

    @pl.when(ki == num_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
               mask_value, o, lse, do):
    # fold scale*log2(e) into q once (fwd did the same; lse is base-2)
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    g = hq // hkv
    nq, nk = sq // block_q, skv // block_k
    has_segments = segment_ids is not None
    if has_segments:
        qseg = segment_ids.q.astype(jnp.int32)[:, None, :]
        kseg = segment_ids.kv.astype(jnp.int32)[:, None, :]
    else:
        qseg = jnp.zeros((b, 1, sq), jnp.int32)
        kseg = jnp.zeros((b, 1, skv), jnp.int32)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (B,H,Sq)
    di = jnp.broadcast_to(di[..., None], (*di.shape, LANES))

    common = dict(scale=scale, causal=causal, block_q=block_q, block_k=block_k,
                  has_segments=has_segments, mask_value=mask_value)
    # dk/dv: grid over kv tiles; q is the reduction dim. kv-head-major so that
    # GQA groups accumulate into distinct (expanded) dk blocks, reduced after.
    dk_exp, dv_exp = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_q=nq, **common),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
        ),
        grid=(b, hq, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, ki, qi: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, ki, qi: (bb, h // g, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, ki, qi: (bb, h // g, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, h, ki, qi: (bb, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bb, h, ki, qi: (bb, 0, ki)),
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, ki, qi: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda bb, h, ki, qi: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda bb, h, ki, qi: (bb, h, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, ki, qi: (bb, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, ki, qi: (bb, h, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(q, k, v, qseg, kseg, do, lse, di)
    if g > 1:
        dk = dk_exp.reshape(b, hkv, g, skv, d).sum(axis=2)
        dv = dv_exp.reshape(b, hkv, g, skv, d).sum(axis=2)
    else:
        dk, dv = dk_exp, dv_exp

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, num_kv=nk, **common),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), jnp.float32),
        grid=(b, hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, qi, ki: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, qi, ki: (bb, h // g, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, qi, ki: (bb, h // g, ki, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, h, qi, ki: (bb, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bb, h, qi, ki: (bb, 0, ki)),
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, qi, ki: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda bb, h, qi, ki: (bb, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda bb, h, qi, ki: (bb, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bb, h, qi, ki: (bb, h, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(q, k, v, qseg, kseg, do, lse, di)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# custom_vjp over (q, k, v, segment_ids); static: scale/causal/blocks/int8
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_attention(q, k, v, segment_ids, scale, causal, block_q, block_k,
                     mask_value, int8_qk=False):
    # primal (not differentiated) path: skip the lse residual entirely
    o, _ = _flash_fwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
                      mask_value, want_lse=False, int8_qk=int8_qk)
    return o


def _flash_attention_fwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
                         mask_value, int8_qk):
    # the differentiated path stays bf16: int8 logits in the fwd would make
    # the recomputed bwd softmax inconsistent with the saved lse
    o, lse = _flash_fwd(q, k, v, segment_ids, scale, causal, block_q, block_k, mask_value)
    return o, (q, k, v, segment_ids, o, lse)


def _flash_attention_bwd(scale, causal, block_q, block_k, mask_value, int8_qk,
                         res, do):
    q, k, v, segment_ids, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
                            mask_value, o, lse, do)
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


# ============================================================ public API
def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def flash_attention(
    q, k, v, *, causal=False, segment_ids: Optional[SegmentIds] = None,
    scale: Optional[float] = None, block_q: int = 1024, block_k: int = 2048,
    mask_value: float = DEFAULT_MASK_VALUE, int8_qk: Optional[bool] = None,
):
    """Flash attention, (B, S, H, D) layout. Pads seq/head_dim as needed.

    int8_qk (default: env PMIX_INT8_ATTN=1) runs QK^T on the int8 MXU path
    with per-row dynamic scales — inference only (the vjp stays bf16)."""
    if int8_qk is None:
        import os as _os

        int8_qk = _os.environ.get("PMIX_INT8_ATTN", "0") == "1"
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if causal and sq != skv:
        # the kernel mask is top-left aligned (col <= row); bottom-right
        # alignment for ragged decode shapes belongs to attention_xla
        raise ValueError(f"flash_attention causal requires sq == skv, got {sq} != {skv}")
    scale = (d ** -0.5) if scale is None else scale
    # block-size sweep on v5e (S=4096/1024, D=64, bf16): a wide kv block wins
    # (1024x2048 edges out 2048x1024 ~2%, both well ahead of 512-class
    # blocks — fewer grid revisits amortize the m/acc rescales); the
    # shrink-to-fit loop lands on 1024x1024 at S=1024, also the winner.
    # fp32 inputs double the q/k/v/p tile bytes — big blocks then overflow
    # the 16MB scoped VMEM, so clamp.
    if q.dtype == jnp.float32:
        block_q = min(block_q, 1024)
        block_k = min(block_k, 1024)
    if d > 256:
        # wide heads (e.g. the VAE mid-block single 512-dim head) grow the
        # q/k/v/acc tiles; shrink blocks to stay inside scoped VMEM
        block_q = min(block_q, 512)
        block_k = min(block_k, 1024)
    block_q = min(block_q, max(128, sq))
    block_k = min(block_k, max(128, skv))
    while sq % block_q and block_q > 128:
        block_q //= 2
    while skv % block_k and block_k > 128:
        block_k //= 2

    # (B,S,H,D) -> (B,H,S,D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    # pad head_dim only when Mosaic can't take it whole: a block whose last
    # dim equals the full array dim is always legal, so d=64 stays unpadded
    # (halves K/V DMA volume vs padding to 128)
    if d != 64 and d % 128 != 0:
        qt, _ = _pad_to(qt, 3, LANES)
        kt, _ = _pad_to(kt, 3, LANES)
        vt, _ = _pad_to(vt, 3, LANES)

    # pad sequences to block multiples; padded kv masked via segment ids
    need_kv_pad = skv % block_k != 0
    if need_kv_pad or segment_ids is not None:
        if segment_ids is None:
            seg_q = jnp.ones((b, sq), jnp.int32)
            seg_kv = jnp.ones((b, skv), jnp.int32)
        else:
            seg_q, seg_kv = segment_ids.q, segment_ids.kv
        seg_q, _ = _pad_to(seg_q.astype(jnp.int32) + 1, 1, block_q)
        seg_kv, _ = _pad_to(seg_kv.astype(jnp.int32) + 1, 1, block_k)
        segment_ids = SegmentIds(seg_q, seg_kv)
    qt, _ = _pad_to(qt, 2, block_q)
    kt, _ = _pad_to(kt, 2, block_k)
    vt, _ = _pad_to(vt, 2, block_k)

    o = _flash_attention(qt, kt, vt, segment_ids, scale, causal, block_q,
                         block_k, mask_value, int8_qk)
    o = o[:, :, :sq, :d]
    return jnp.swapaxes(o, 1, 2)


def flash_attention_with_lse(
    q, k, v, *, segment_ids: Optional[SegmentIds] = None,
    scale: Optional[float] = None, causal: bool = False,
    block_q: int = 1024, block_k: int = 2048,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    """Flash attention returning (o, lse) with lse in BASE-2, (B, S, H) fp32.

    The building block for ring attention: per-shard partial results merge
    across ring steps via logsumexp weights. Same padding rules as
    flash_attention."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    scale = (d ** -0.5) if scale is None else scale
    if q.dtype == jnp.float32:
        block_q = min(block_q, 1024)
        block_k = min(block_k, 1024)
    if d > 256:
        block_q = min(block_q, 512)
        block_k = min(block_k, 1024)
    block_q = min(block_q, max(128, sq))
    block_k = min(block_k, max(128, skv))
    while sq % block_q and block_q > 128:
        block_q //= 2
    while skv % block_k and block_k > 128:
        block_k //= 2
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if d != 64 and d % 128 != 0:
        qt, _ = _pad_to(qt, 3, LANES)
        kt, _ = _pad_to(kt, 3, LANES)
        vt, _ = _pad_to(vt, 3, LANES)
    need_kv_pad = skv % block_k != 0
    if need_kv_pad or segment_ids is not None:
        if segment_ids is None:
            seg_q = jnp.ones((b, sq), jnp.int32)
            seg_kv = jnp.ones((b, skv), jnp.int32)
        else:
            seg_q, seg_kv = segment_ids.q, segment_ids.kv
        seg_q, _ = _pad_to(seg_q.astype(jnp.int32) + 1, 1, block_q)
        seg_kv, _ = _pad_to(seg_kv.astype(jnp.int32) + 1, 1, block_k)
        segment_ids = SegmentIds(seg_q, seg_kv)
    qt, _ = _pad_to(qt, 2, block_q)
    kt, _ = _pad_to(kt, 2, block_k)
    vt, _ = _pad_to(vt, 2, block_k)
    o, lse = _flash_fwd(qt, kt, vt, segment_ids, scale, causal, block_q,
                        block_k, mask_value, want_lse=True)
    o = jnp.swapaxes(o[:, :, :sq, :d], 1, 2)
    lse = jnp.swapaxes(lse[:, :, :sq, 0], 1, 2)  # (B, Sq, Hq)
    return o, lse


def scaled_dot_product_attention(
    q, k, v, *, bias=None, causal=False, segment_ids: Optional[SegmentIds] = None,
    scale: Optional[float] = None, dropout_rate: float = 0.0, dropout_rng=None,
    impl: Optional[str] = None,
):
    """Backend-dispatched SDPA, (B, S, H, D) layout.

    impl: None (auto) | "flash" | "math". Auto picks the Pallas flash kernel on
    TPU when there is no additive bias/dropout and kv_len >= 128."""
    if impl is None:
        flashable = (
            use_pallas() and bias is None and dropout_rate == 0.0
            # d<=256: wider heads (VAE mid-block d=512) measure SLOWER via
            # flash than XLA math on v5e (120ms vs 114ms for the 1024px VAE
            # decode) — the K=512 contraction doesn't pay for the kernel's
            # extra softmax state passes at bq=512
            and k.shape[1] >= 128 and q.shape[3] <= 256
            # non-128-multiple short seqs (e.g. CLIP ViT's 197) lose to XLA
            # math: the kernel pads to the block AND XLA inserts (B,S,H,D)->
            # (B,H,S,D) layout copies around the custom-call that it would
            # otherwise fuse into the matmuls. Measured on v5e, CLIP-B/16
            # e2e: batch 256 = 138.6 ms math vs 163.7 ms flash (math wins);
            # batch 1024 = 681 ms math vs 564 ms flash (the materialized
            # fp32 scores hit ~1.9 GB/layer of HBM traffic — flash wins).
            # Rule: unaligned seqs go to math unless the score tensor is
            # HBM-scale (> ~1 GB) or the seq is long (>= 1024).
            and (k.shape[1] % 128 == 0 or k.shape[1] >= 1024
                 or q.shape[0] * q.shape[2] * q.shape[1] * k.shape[1] * 4 > 1e9)
            # flash kernel's causal mask is top-left aligned; attention_xla is
            # bottom-right — only equivalent when sq == skv, so route ragged
            # causal shapes to the XLA path
            and (not causal or q.shape[1] == k.shape[1])
        )
        impl = "flash" if flashable else "math"
    if impl == "flash":
        return flash_attention(q, k, v, causal=causal, segment_ids=segment_ids, scale=scale)
    return attention_xla(
        q, k, v, bias=bias, causal=causal, segment_ids=segment_ids, scale=scale,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    )
