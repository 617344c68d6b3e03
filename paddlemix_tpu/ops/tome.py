"""Token merging (ToMe) for diffusion self-attention.

Rebuild of the reference tomesd patch (ppdiffusers/patches/
tomesd_patch_utils.py, after Bolya et al.): bipartite soft matching merges the
r most-similar "source" tokens into their best "destination" token before
self-attention and unmerges afterwards — static shapes throughout (r is a
compile-time fraction), so the whole thing jits."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def build_tome(x: jnp.ndarray, grid_h: int, grid_w: int, ratio: float,
               sx: int = 2, sy: int = 2) -> Tuple[Callable, Callable]:
    """x: (B, N, C) spatial tokens on a (grid_h, grid_w) grid.

    Returns (merge, unmerge): merge(t) -> (B, N - r, C); unmerge restores N.
    Destination tokens are one per sy x sx region (top-left); the r most
    similar sources merge into their nearest destination by cosine sim."""
    b, n, c = x.shape
    assert n == grid_h * grid_w
    gy, gx = grid_h // sy, grid_w // sx
    idx = jnp.arange(n).reshape(grid_h, grid_w)
    dst_idx = idx[::sy, ::sx].reshape(-1)                      # (n_dst,)
    dst_mask = jnp.zeros((n,), bool).at[dst_idx].set(True)
    src_idx = jnp.nonzero(~dst_mask, size=n - dst_idx.shape[0])[0]  # (n_src,)
    n_dst, n_src = dst_idx.shape[0], src_idx.shape[0]
    r = min(int(n * ratio), n_src)
    if r <= 0:
        return (lambda t: t), (lambda t: t)

    metric = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
    a = metric[:, src_idx]                                     # (B, n_src, C)
    bdst = metric[:, dst_idx]                                  # (B, n_dst, C)
    scores = jnp.einsum("bsc,bdc->bsd", a, bdst)               # (B, n_src, n_dst)
    best_dst = jnp.argmax(scores, axis=-1)                     # (B, n_src)
    best_score = jnp.max(scores, axis=-1)
    # the r highest-similarity sources get merged
    order = jnp.argsort(-best_score, axis=-1)                  # (B, n_src)
    merged_rows = order[:, :r]                                 # (B, r) -> rows of src
    kept_rows = order[:, r:]                                   # (B, n_src - r)

    bidx = jnp.arange(b)[:, None]
    merged_src_tokens = src_idx[merged_rows]                   # (B, r) token ids
    kept_src_tokens = src_idx[kept_rows]                       # (B, n_src - r)
    merge_target = best_dst[bidx, merged_rows]                 # (B, r) dst rows

    def merge(t: jnp.ndarray) -> jnp.ndarray:
        """t: (B, N, C') -> (B, n_dst + n_src - r, C') [dst first, then kept]."""
        tdst = t[bidx, dst_idx[None, :]]                       # (B, n_dst, C')
        tmerged = t[bidx, merged_src_tokens]                   # (B, r, C')
        # mean-merge: scatter-add merged tokens onto their destinations
        counts = jnp.ones((b, n_dst, 1)).at[bidx, merge_target].add(1.0)
        tdst = tdst.at[bidx, merge_target].add(tmerged) / counts
        tkept = t[bidx, kept_src_tokens]
        return jnp.concatenate([tdst, tkept], axis=1)

    def unmerge(t: jnp.ndarray) -> jnp.ndarray:
        """inverse: merged sources take their destination's value."""
        tdst, tkept = t[:, :n_dst], t[:, n_dst:]
        out = jnp.zeros((b, n, t.shape[-1]), t.dtype)
        out = out.at[bidx, dst_idx[None, :]].set(tdst)
        out = out.at[bidx, kept_src_tokens].set(tkept)
        out = out.at[bidx, merged_src_tokens].set(tdst[bidx, merge_target])
        return out

    return merge, unmerge
