"""Paged/blocked KV cache tests: decode parity with the dense cache (the
correctness contract), lazy block allocation, and memory sharing across
mixed-length sequences (reference paddlenlp_ops blocked KV,
deploy/llava/README.md:20-38)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM, greedy_generate
from paddlemix_tpu.models.llama.paged import PagedKVCache, paged_greedy_generate
from paddlemix_tpu.ops.attention import SegmentIds

TINY = LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    eos_token_id=2,
)


@pytest.fixture(scope="module")
def model():
    return LlamaForCausalLM.from_config(TINY, seed=0)


def test_paged_matches_dense_decode(model):
    """Prefill + stepwise decode through the paged cache reproduces the dense
    static-cache logits."""
    ids = jnp.asarray([[1, 5, 9, 11, 3, 7]], jnp.int32)
    full_logits, _ = model(ids)

    cache = PagedKVCache.create(TINY, batch=1, num_blocks=4, block_size=4,
                                max_blocks_per_seq=4, dtype=jnp.float32)
    mask = jnp.ones((1, 4), jnp.int32)
    positions = jnp.arange(4)[None]
    logits_p, cache = model(ids[:, :4], positions,
                            segment_ids=SegmentIds(mask, mask), cache=cache)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(full_logits[:, :4]), atol=2e-3)
    for step in range(4, 6):
        pos = cache.lengths[:, None]
        logits_d, cache = model(ids[:, step: step + 1], pos, cache=cache)
        np.testing.assert_allclose(np.asarray(logits_d[:, 0]),
                                   np.asarray(full_logits[:, step]), atol=2e-3,
                                   err_msg=f"step {step}")


def test_lazy_block_allocation(model):
    """Blocks are assigned only as sequences grow into them."""
    cache = PagedKVCache.create(TINY, batch=2, num_blocks=8, block_size=4,
                                max_blocks_per_seq=4, dtype=jnp.float32)
    assert int(cache.num_allocated) == 0
    # sequence 0 writes 3 tokens (1 block), sequence 1 writes 6 (2 blocks)
    positions = jnp.asarray([[0, 1, 2, -1, -1, -1], [0, 1, 2, 3, 4, 5]])
    cache = cache.allocate_for(positions)
    assert int(cache.num_allocated) == 3
    assert int((cache.block_tables[0] >= 0).sum()) == 1
    assert int((cache.block_tables[1] >= 0).sum()) == 2
    # next token for sequence 0 (position 3) still fits its block
    cache2 = cache.allocate_for(jnp.asarray([[3], [6]]))
    assert int(cache2.num_allocated) == 3
    # position 4 crosses into a new block
    cache3 = cache2.allocate_for(jnp.asarray([[4], [7]]))
    assert int(cache3.num_allocated) == 4


def test_paged_generation_matches_dense(model):
    ids = jnp.asarray([[1, 5, 9, 11]], jnp.int32)
    dense = greedy_generate(model, ids, max_new_tokens=8)
    paged = paged_greedy_generate(model, ids, max_new_tokens=8, block_size=4)
    np.testing.assert_array_equal(np.asarray(paged), np.asarray(dense))


def test_paged_memory_smaller_than_dense():
    """The pool for mixed-length serving is smaller than per-sequence dense
    reservation: 4 seqs x 16-token pool vs 4 x 128 dense slots."""
    cache = PagedKVCache.create(TINY, batch=4, num_blocks=16, block_size=4,
                                max_blocks_per_seq=32, dtype=jnp.float32)
    pool_tokens = cache.k_pool.shape[1] * cache.block_size
    assert pool_tokens == 64  # shared arena, not 4*128
    assert cache.max_len == 128  # while each sequence may still grow to 128


def test_pallas_ragged_kernel_parity_fragmented():
    """The Pallas ragged decode kernel (ops/paged_attention.py) matches the
    dense gathered-view attention on a FRAGMENTED pool: sequences own
    unordered block ids, mixed lengths, GQA heads."""
    from paddlemix_tpu.ops.paged_attention import paged_decode_attention

    rng = np.random.RandomState(1)
    B, H, KVH, HD, BS, NBMAX, NPOOL = 2, 8, 2, 128, 128, 3, 8
    q = jnp.asarray(rng.randn(B, H, HD), jnp.float32) * 0.4
    k_pool = jnp.asarray(rng.randn(NPOOL, KVH, BS, HD), jnp.float32) * 0.4
    v_pool = jnp.asarray(rng.randn(NPOOL, KVH, BS, HD), jnp.float32) * 0.4
    bt = jnp.asarray([[6, 1, 4], [3, -1, -1]], jnp.int32)
    lengths = jnp.asarray([290, 77], jnp.int32)

    import os
    os.environ["PMIX_PALLAS_INTERPRET"] = "1"
    try:
        out = np.asarray(paged_decode_attention(q, k_pool, v_pool, bt, lengths))
    finally:
        del os.environ["PMIX_PALLAS_INTERPRET"]

    grp = H // KVH
    for b in range(B):
        tb = np.maximum(np.asarray(bt[b]), 0)
        k = np.asarray(k_pool)[tb].transpose(0, 2, 1, 3).reshape(NBMAX * BS, KVH, HD)
        v = np.asarray(v_pool)[tb].transpose(0, 2, 1, 3).reshape(NBMAX * BS, KVH, HD)
        L = int(lengths[b])
        for h in range(H):
            logit = (np.asarray(q)[b, h] @ k[:L, h // grp].T) * HD ** -0.5
            p = np.exp(logit - logit.max())
            p /= p.sum()
            np.testing.assert_allclose(out[b, h], p @ v[:L, h // grp],
                                       rtol=2e-5, atol=2e-5)


def test_paged_generate_through_kernel():
    """End-to-end paged greedy generation routed through the Pallas kernel
    (kernel-eligible shapes: hd=128, block_size=128) matches the dense path."""
    import os

    cfg = LlamaConfig(vocab_size=64, hidden_size=256, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=512,
                      eos_token_id=2)
    m = LlamaForCausalLM.from_config(cfg, seed=0)
    ids = jnp.asarray([[1, 5, 9, 11], [1, 7, 3, 2]], jnp.int32)
    dense = greedy_generate(m, ids, max_new_tokens=6)
    os.environ["PMIX_PALLAS_INTERPRET"] = "1"
    os.environ["PMIX_KERNEL_BACKEND"] = "pallas"
    try:
        paged = paged_greedy_generate(m, ids, max_new_tokens=6, block_size=128)
    finally:
        del os.environ["PMIX_PALLAS_INTERPRET"]
        del os.environ["PMIX_KERNEL_BACKEND"]
    np.testing.assert_array_equal(np.asarray(paged), np.asarray(dense))
