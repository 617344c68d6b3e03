"""Ulysses (DeepSpeed-style) sequence parallelism: all-to-all head scatter.

The survey's alternative to ring attention (SURVEY §2.5): with q/k/v sharded
over the sequence axis, an all_to_all swaps the shard axis from sequence to
heads, each device computes FULL-sequence attention for its head slice, and a
second all_to_all swaps back. Two collectives instead of N ppermutes — better
when heads >= devices and the sequence fits per-device memory."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.attention import scaled_dot_product_attention


def ulysses_attention(q, k, v, axis_name: str, *, causal: bool = False):
    """Inside shard_map: q/k/v (B, S_local, H, D) with H % n_devices == 0."""
    # scatter heads, gather sequence: (B, S/n, H, D) -> (B, S, H/n, D)
    def head_scatter(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def head_gather(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    qh, kh, vh = head_scatter(q), head_scatter(k), head_scatter(v)
    out = scaled_dot_product_attention(qh, kh, vh, causal=causal)
    return head_gather(out)


def make_ulysses_attention(mesh, axis_name: str = "sequence", causal: bool = False):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name, None, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    def fn(q, k, v):
        return ulysses_attention(q, k, v, axis_name, causal=causal)

    return fn
