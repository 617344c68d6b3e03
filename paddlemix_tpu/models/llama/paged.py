"""Paged (blocked) KV cache for serving.

TPU-native counterpart of the reference deploy stack's paddlenlp_ops
blocked KV cache (deploy/llava/README.md:20-38 block_attn / cachekv int8;
SURVEY §2.4 item 6): the KV pool is a fixed arena of fixed-size blocks;
sequences own blocks through a block table and allocate lazily as they grow,
so a batch of mixed-length sequences shares HBM instead of each reserving
max_len.

Everything is functional and shape-static so the whole decode loop jits:
- allocation is a vectorized cumsum over "needs a block at this step" flags
  (no host round-trips),
- writes scatter into (layer, block, offset) coordinates,
- decode attention reads through the Pallas ragged paged-attention kernel
  (ops/paged_attention.py): the block table drives the kernel's DMA index
  maps, so only owned blocks are read — no dense gather materializes.
  ``layer_view`` remains as the prefill/fallback dense path.

Pool layout is (layers, num_blocks, kv_heads, block_size, head_dim): one
(block, head) tile is a contiguous HBM stretch for the kernel's DMAs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .configuration import LlamaConfig


class PagedKVCache(NamedTuple):
    k_pool: jnp.ndarray        # (layers, num_blocks, kvh, block_size, hd)
    v_pool: jnp.ndarray
    block_tables: jnp.ndarray  # (B, max_blocks_per_seq) int32, -1 = unassigned
    lengths: jnp.ndarray       # (B,) tokens written per sequence
    num_allocated: jnp.ndarray  # () int32 — pool watermark

    @classmethod
    def create(cls, config: LlamaConfig, batch: int, num_blocks: int,
               block_size: int = 128, max_blocks_per_seq: int = None,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        max_blocks_per_seq = max_blocks_per_seq or num_blocks
        shape = (config.num_hidden_layers, num_blocks, config.kv_heads,
                 block_size, config.head_dim_)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.full((batch, max_blocks_per_seq), -1, jnp.int32),
                   jnp.zeros((batch,), jnp.int32),
                   jnp.zeros((), jnp.int32))

    @property
    def block_size(self) -> int:
        return self.k_pool.shape[3]

    @property
    def max_len(self) -> int:
        return self.block_tables.shape[1] * self.block_size

    def allocate_for(self, positions) -> "PagedKVCache":
        """Assign pool blocks so every position in ``positions`` (B, S; -1 =
        padding) has a home. Pure function of the cache state."""
        bs = self.block_size
        b, max_blocks = self.block_tables.shape
        # highest block index each sequence needs after this write
        max_pos = jnp.max(jnp.where(positions >= 0, positions, 0), axis=1)
        any_valid = jnp.any(positions >= 0, axis=1)
        need_upto = jnp.where(any_valid, max_pos // bs, -1)   # (B,)
        block_idx = jnp.arange(max_blocks)[None, :]
        need = (block_idx <= need_upto[:, None]) & (self.block_tables < 0)
        order = jnp.cumsum(need.reshape(-1)) - 1               # flat alloc order
        new_ids = (self.num_allocated + order).reshape(b, max_blocks)
        tables = jnp.where(need, new_ids.astype(jnp.int32), self.block_tables)
        return self._replace(block_tables=tables,
                             num_allocated=self.num_allocated
                             + need.sum().astype(jnp.int32))

    def update(self, layer_idx: int, k, v, positions) -> "PagedKVCache":
        """Write k/v (B, S, kvh, hd) at ``positions`` (B, S); padding
        positions (-1) park in block-0 slot-(bs-1)... they are masked by
        ``lengths`` at read time. Call allocate_for ONCE per step first."""
        bs = self.block_size
        b, s = positions.shape
        safe_pos = jnp.maximum(positions, 0)
        blk = jnp.take_along_axis(self.block_tables, safe_pos // bs, axis=1)
        blk = jnp.maximum(blk, 0)                              # (B, S)
        off = safe_pos % bs
        # dead-write redirect: padding goes to a scratch slot of block 0
        is_pad = positions < 0
        blk = jnp.where(is_pad, 0, blk)
        off = jnp.where(is_pad, bs - 1, off)
        flat_blk = blk.reshape(-1)
        flat_off = off.reshape(-1)
        # pool is (layers, nb, kvh, bs, hd); tokens write (kvh, hd) slabs
        kt = k.reshape(b * s, *k.shape[2:]).astype(self.k_pool.dtype)
        vt = v.reshape(b * s, *v.shape[2:]).astype(self.v_pool.dtype)
        kp = self.k_pool.at[layer_idx, flat_blk, :, flat_off].set(kt)
        vp = self.v_pool.at[layer_idx, flat_blk, :, flat_off].set(vt)
        return self._replace(k_pool=kp, v_pool=vp)

    def layer_view(self, layer_idx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dense (B, max_len, kvh, hd) gather of each sequence's blocks —
        the prefill/fallback path (decode uses the Pallas ragged kernel)."""
        b, max_blocks = self.block_tables.shape
        tables = jnp.maximum(self.block_tables, 0)
        k = self.k_pool[layer_idx][tables]   # (B, max_blocks, kvh, bs, hd)
        v = self.v_pool[layer_idx][tables]
        bs = self.block_size
        k = k.transpose(0, 1, 3, 2, 4)       # (B, max_blocks, bs, kvh, hd)
        v = v.transpose(0, 1, 3, 2, 4)
        return (k.reshape(b, max_blocks * bs, *k.shape[3:]),
                v.reshape(b, max_blocks * bs, *v.shape[3:]))


def paged_greedy_generate(model, input_ids, attention_mask=None,
                          max_new_tokens: int = 32, block_size: int = 128,
                          num_blocks: int = None, eos_token_id=None):
    """Greedy generation over the paged cache: one jitted prefill + while_loop
    decode, blocks allocated lazily inside the loop. Mirrors
    greedy_generate's contract; returns (B, max_new_tokens) tokens."""
    import numpy as np

    from .modeling import SegmentIds

    params = model.params
    module = model.module
    eos = eos_token_id if eos_token_id is not None else model.config.eos_token_id
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    max_len = s + max_new_tokens
    max_blocks_per_seq = -(-max_len // block_size)
    if num_blocks is None:
        num_blocks = b * max_blocks_per_seq  # worst case; callers can shrink

    @jax.jit
    def run(params, input_ids, attention_mask):
        cache = PagedKVCache.create(model.config, b, num_blocks, block_size,
                                    max_blocks_per_seq, dtype=model.dtype)
        positions = jnp.cumsum(attention_mask, axis=-1) - 1
        positions = jnp.where(attention_mask > 0, positions, -1)
        seg = SegmentIds(attention_mask, attention_mask)
        logits, cache = module.apply({"params": params}, input_ids, positions,
                                     segment_ids=seg, cache=cache)
        lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
        last = logits[jnp.arange(b), lengths - 1]
        next_tok = jnp.argmax(last.astype(jnp.float32), axis=-1).astype(jnp.int32)
        tokens = jnp.zeros((b, max_new_tokens), jnp.int32).at[:, 0].set(next_tok)
        done = next_tok == eos

        def cond(carry):
            step, *_ , done = carry
            return (step < max_new_tokens - 1) & ~jnp.all(done)

        def body(carry):
            step, tokens, cache, done = carry
            cur = tokens[:, step][:, None]
            pos = cache.lengths[:, None]
            logits, cache = module.apply({"params": params}, cur, pos,
                                         cache=cache)
            nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                             axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, eos, nxt)
            tokens = tokens.at[:, step + 1].set(nxt)
            return step + 1, tokens, cache, done | (nxt == eos)

        _, tokens, _, _ = jax.lax.while_loop(cond, body, (0, tokens, cache, done))
        return tokens

    return run(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))
