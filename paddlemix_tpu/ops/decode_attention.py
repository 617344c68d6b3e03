"""Decode attention: single-query attention over the KV cache, Pallas-tiled.

TPU-native counterpart of the reference's paddlenlp_ops fused decode kernels
(SURVEY §2.4 item 6: blocked/paged KV-cache attention used by deploy/llava and
deploy/qwen_vl). The cache here is the framework's static layout
(B, L, kv_heads, head_dim); the kernel streams KV blocks through VMEM with the
online-softmax accumulator and masks by per-sample length — one fused kernel
per decode step instead of the XLA gather+softmax chain.
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

NEG = -0.7 * float(np.finfo(np.float32).max)


def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                   *, scale, block_k, num_blocks, groups):
    """Grid: (B, KVH, num_blocks). q: (1, G, D) per (batch, kv head)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # whole (B,) vector lives in SMEM (rank-1 SMEM blocks must equal the
    # array dim on TPU); index by the batch program id
    length = len_ref[pl.program_id(0)]
    # skip blocks entirely beyond the written length
    @pl.when(ki * block_k < length)
    def _run():
        q = q_ref[0].astype(jnp.float32) * scale        # (G, D)
        k = k_ref[0].astype(jnp.float32)                 # (block_k, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (G, block_k)
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(pos < length, s, NEG)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = jnp.broadcast_to(alpha * l_prev[:, :1] + jnp.sum(p, 1)[:, None],
                                      l_prev.shape)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)

    @pl.when(ki == num_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def decode_attention(q, k_cache, v_cache, lengths, *, scale: Optional[float] = None,
                     block_k: int = 512):
    """q: (B, 1, Hq, D); k/v_cache: (B, L, KVH, D); lengths: (B,) tokens valid
    (the current token must already be written). Returns (B, 1, Hq, D)."""
    b, one, hq, d = q.shape
    _, L, kvh, _ = k_cache.shape
    g = hq // kvh
    scale = (d ** -0.5) if scale is None else scale
    block_k = min(block_k, L)
    while L % block_k:
        block_k //= 2
    num_blocks = L // block_k

    # (B, KVH, G, D) query layout; caches to (B, KVH, L, D)
    qg = q[:, 0].reshape(b, kvh, g, d)
    kt = jnp.swapaxes(k_cache, 1, 2)
    vt = jnp.swapaxes(v_cache, 1, 2)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_k=block_k,
                          num_blocks=num_blocks, groups=g),
        grid=(b, kvh, num_blocks),
        out_shape=jax.ShapeDtypeStruct((b * kvh, g, d), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g, d), lambda bb, h, ki: (bb * kvh + h, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, h, ki: (bb * kvh + h, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, h, ki: (bb * kvh + h, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, d), lambda bb, h, ki: (bb * kvh + h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(lengths.astype(jnp.int32), qg.reshape(b * kvh, g, d),
      kt.reshape(b * kvh, L, d), vt.reshape(b * kvh, L, d))
    return out.reshape(b, 1, hq, d)


def decode_attention_xla(q, k_cache, v_cache, lengths, *, scale: Optional[float] = None):
    """Reference implementation (and CPU path)."""
    b, one, hq, d = q.shape
    _, L, kvh, _ = k_cache.shape
    scale = (d ** -0.5) if scale is None else scale
    if kvh != hq:
        k_cache = jnp.repeat(k_cache, hq // kvh, axis=2)
        v_cache = jnp.repeat(v_cache, hq // kvh, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) * scale
    mask = jnp.arange(L)[None, None, None, :] < lengths[:, None, None, None]
    logits = jnp.where(mask, logits, NEG)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v_cache.dtype),
                      v_cache).astype(q.dtype)


def _decode_kernel_int8(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                        m_scr, l_scr, acc_scr, *, scale, block_k, num_blocks,
                        groups):
    """int8-cache variant (reference deploy cachekv_int8): k/v arrive int8
    with per-token scales; dequant happens in VMEM right before the MXU, so
    HBM cache reads are half the bf16 kernel's."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = len_ref[pl.program_id(0)]

    @pl.when(ki * block_k < length)
    def _run():
        q = q_ref[0].astype(jnp.float32) * scale
        # scales arrive as the full (num_blocks, block_k) row (lane dim =
        # block_k keeps the Mosaic 128-lane rule satisfied via the
        # equal-to-array-dim escape hatch); pick this step's sublane row
        ks = ks_ref[0, ki].astype(jnp.float32)          # (block_k,)
        k = k_ref[0].astype(jnp.float32) * ks[:, None]  # dequant in VMEM
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(pos < length, s, NEG)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = jnp.broadcast_to(
            alpha * l_prev[:, :1] + jnp.sum(p, 1)[:, None], l_prev.shape)
        m_scr[...] = m_next
        vs = vs_ref[0, ki].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32) * vs[:, None]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(ki == num_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def decode_attention_int8(q, k_q, v_q, k_scale, v_scale, lengths, *,
                          scale: Optional[float] = None, block_k: int = 512):
    """q: (B, 1, Hq, D); k_q/v_q: (B, L, KVH, D) int8; k/v_scale:
    (B, L, KVH) float32. Returns (B, 1, Hq, D)."""
    b, one, hq, d = q.shape
    _, L, kvh, _ = k_q.shape
    g = hq // kvh
    scale = (d ** -0.5) if scale is None else scale
    block_k = min(block_k, L)
    while L % block_k:
        block_k //= 2
    num_blocks = L // block_k

    qg = q[:, 0].reshape(b, kvh, g, d)
    kt = jnp.swapaxes(k_q, 1, 2).reshape(b * kvh, L, d)
    vt = jnp.swapaxes(v_q, 1, 2).reshape(b * kvh, L, d)
    # (rows, num_blocks, block_k): whole row stays VMEM-resident across the
    # ki loop; last-two block dims equal the array dims, which is the only
    # Mosaic-legal layout when block_k isn't a multiple of 128 (e.g. L=704).
    kst = jnp.swapaxes(k_scale, 1, 2).reshape(b * kvh, num_blocks, block_k)
    vst = jnp.swapaxes(v_scale, 1, 2).reshape(b * kvh, num_blocks, block_k)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_int8, scale=scale, block_k=block_k,
                          num_blocks=num_blocks, groups=g),
        grid=(b, kvh, num_blocks),
        out_shape=jax.ShapeDtypeStruct((b * kvh, g, d), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g, d), lambda bb, h, ki: (bb * kvh + h, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, h, ki: (bb * kvh + h, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, h, ki: (bb * kvh + h, ki, 0)),
            pl.BlockSpec((1, num_blocks, block_k),
                         lambda bb, h, ki: (bb * kvh + h, 0, 0)),
            pl.BlockSpec((1, num_blocks, block_k),
                         lambda bb, h, ki: (bb * kvh + h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, d), lambda bb, h, ki: (bb * kvh + h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(lengths.astype(jnp.int32), qg.reshape(b * kvh, g, d), kt, vt, kst, vst)
    return out.reshape(b, 1, hq, d)
