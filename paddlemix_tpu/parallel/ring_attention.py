"""Ring attention: sequence/context parallelism over the mesh's sequence axis.

The reference has only a vestigial sequence-parallel flag (SURVEY.md §2.5:
Open-Sora stdit2.py:48 never wired; sep-parallel lives inside PaddleNLP).
This is the TPU-native implementation the survey calls for: blockwise
online-softmax attention with KV blocks rotated around the ring via
jax.lax.ppermute, overlapping compute with ICI transfers. Use inside
shard_map with q/k/v sharded over the sequence axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import DEFAULT_MASK_VALUE


def ring_attention(q, k, v, axis_name: str, *, causal: bool = False,
                   scale: Optional[float] = None):
    """q/k/v: (B, S_local, H, D) — the local sequence shard. Must run inside
    shard_map/pjit with ``axis_name`` sized n_devices; returns (B, S_local, H, D).

    Online softmax accumulates across ring steps; causal masking uses global
    block indices (device i holds tokens [i*S_local, (i+1)*S_local))."""
    b, s_loc, h, d = q.shape
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    scale = (d ** -0.5) if scale is None else scale

    qf = q.astype(jnp.float32) * scale
    # accumulators: per (B, H, S, 1)
    o = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m = jnp.full((b, s_loc, h, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, s_loc, h, 1), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)] if isinstance(n, int) else None

    def body(step, carry):
        o, m, l, k_blk, v_blk = carry
        src = (my_idx - step) % n  # global block index currently held
        s_kv = k_blk.shape[1]
        logits = jnp.einsum("bqhd,bkhd->bqhk", qf, k_blk.astype(jnp.float32))
        if causal:
            q_pos = my_idx * s_loc + jnp.arange(s_loc)[:, None]
            k_pos = src * s_kv + jnp.arange(s_kv)[None, :]
            mask = (k_pos <= q_pos)[None, :, None, :]
            logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * alpha + jnp.einsum("bqhk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        # rotate kv to the next device (skipped compute-wise on last step)
        k_nxt = jax.lax.ppermute(k_blk, axis_name, [(i, (i + 1) % n) for i in range(n)])
        v_nxt = jax.lax.ppermute(v_blk, axis_name, [(i, (i + 1) % n) for i in range(n)])
        return o_new, m_new, l_new, k_nxt, v_nxt

    o, m, l, _, _ = jax.lax.fori_loop(0, n, body, (o, m, l, k, v))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (o / l_safe).astype(q.dtype)


def make_ring_attention(mesh, axis_name: str = "sequence", causal: bool = False):
    """Convenience shard_map wrapper: full (B, S, H, D) arrays in/out."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name, None, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name, causal=causal)

    return fn
