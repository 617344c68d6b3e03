"""Pallas ragged paged-attention decode kernel.

TPU-native counterpart of the reference deploy stack's blocked-KV decode
attention (paddlenlp_ops block_attn, /root/reference/deploy/llava/README.md:
20-38; SURVEY §2.4.6 "ragged paged-attention decode kernels"): sequences own
fixed-size KV blocks through a block table, and decode attention reads ONLY
the blocks a sequence owns — no dense (B, max_len) gather ever materializes
in HBM.

Design (not a CUDA translation — the reference kernel is a warp-per-block
gather; this uses the Pallas pipeline itself as the gather engine):
- grid = (B, max_blocks_per_seq); the kernel runs sequentially over a
  sequence's blocks with online-softmax state in VMEM scratch.
- the k/v BlockSpec index_maps read the scalar-prefetched block table:
  block i of sequence b maps to pool block ``block_tables[b, i]``. The
  Pallas pipeline double-buffers these DMAs automatically, and consecutive
  grid steps that map to the SAME pool block (padding steps clamp to the
  previous valid block) skip the re-fetch, so out-of-range steps cost no
  HBM traffic.
- per-kv-head (grp, hd) @ (hd, bs) dots on the MXU; decode is
  weight/cache-bandwidth-bound so MXU underutilization at grp<8 is fine —
  the win is reading len/bs blocks instead of max_blocks.

Pool layout is (num_blocks, kv_heads, block_size, head_dim): one
(block, head) tile is a contiguous (block_size, head_dim) HBM stretch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_NEG_INF = -1e30


def _paged_decode_kernel(bt_ref, len_ref, q_ref, k_ref, v_ref, o_ref,
                         acc_ref, m_ref, l_ref, *, bs, grp, scale):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb_max = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    length = len_ref[b]

    @pl.when(i * bs < length)
    def _compute():
        kvh = k_ref.shape[1]
        pos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        invalid = pos >= length                       # (1, bs)
        for h in range(kvh):
            rows = slice(h * grp, (h + 1) * grp)
            qh = q_ref[0, rows, :].astype(jnp.float32)       # (grp, hd)
            kh = k_ref[0, h].astype(jnp.float32)             # (bs, hd)
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # (grp, bs)
            logits = jnp.where(invalid, _NEG_INF, logits)
            m_prev = m_ref[rows, :][:, :1]                    # (grp, 1)
            l_prev = l_ref[rows, :][:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
            p = jnp.exp(logits - m_new)                       # (grp, bs)
            # a fully-masked tile keeps exp(-inf - -inf)=exp(0) garbage out:
            p = jnp.where(invalid, 0.0, p)
            alpha = jnp.exp(m_prev - m_new)                   # (grp, 1)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            vh = v_ref[0, h].astype(jnp.float32)              # (bs, hd)
            pv = jax.lax.dot(p, vh, preferred_element_type=jnp.float32)
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + pv
            m_ref[rows, :] = jnp.broadcast_to(m_new, m_ref[rows, :].shape)
            l_ref[rows, :] = jnp.broadcast_to(l_new, l_ref[rows, :].shape)

    @pl.when(i == nb_max - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def paged_decode_attention(q, k_pool, v_pool, block_tables, lengths, *,
                           scale: float | None = None):
    """Single-token decode attention over a paged KV pool.

    q:            (B, H, hd) — current-step queries (post-rope).
    k_pool/v_pool:(num_blocks, kvh, bs, hd) fp pools.
    block_tables: (B, nb_max) int32, -1 = unassigned.
    lengths:      (B,) int32 — valid tokens per sequence (incl. current).
    Returns (B, H, hd) in q.dtype.
    """
    b, h, hd = q.shape
    _, kvh, bs, _ = k_pool.shape
    nb_max = block_tables.shape[1]
    grp = h // kvh
    if scale is None:
        scale = hd ** -0.5

    # forward-fill unassigned (-1) entries with the last valid block id:
    # padding grid steps then re-map to an already-resident block and the
    # pipeline skips the DMA entirely. (NOT a running max — pools fragment,
    # so a sequence's block ids are unordered.)
    bt = jax.lax.associative_scan(
        lambda a, b: jnp.where(b < 0, a, b), block_tables, axis=1)
    bt = jnp.maximum(bt, 0)

    kernel = functools.partial(_paged_decode_kernel, bs=bs, grp=grp,
                               scale=float(scale))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nb_max),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda bb, ii, bt_ref, len_ref: (bb, 0, 0)),
            pl.BlockSpec((1, kvh, bs, hd),
                         lambda bb, ii, bt_ref, len_ref: (bt_ref[bb, ii], 0, 0, 0)),
            pl.BlockSpec((1, kvh, bs, hd),
                         lambda bb, ii, bt_ref, len_ref: (bt_ref[bb, ii], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, hd),
                               lambda bb, ii, bt_ref, len_ref: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(bt, lengths, q, k_pool, v_pool)


def paged_decode_supported(h, kvh, hd, bs) -> bool:
    """Shapes the kernel handles: lane-aligned head_dim/block_size, grouped
    heads dividing evenly."""
    return hd % 128 == 0 and bs % 128 == 0 and h % kvh == 0
