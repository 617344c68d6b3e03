"""Ring attention over the sequence axis vs single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.ops.attention import attention_xla
from paddlemix_tpu.parallel.mesh import MeshConfig, create_mesh
from paddlemix_tpu.parallel.ring_attention import make_ring_attention


@pytest.fixture(scope="module")
def seq_mesh():
    return create_mesh(MeshConfig(1, 1, 1, 8))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(seq_mesh, causal):
    b, s, h, d = 2, 64, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    ref = attention_xla(q, k, v, causal=causal)
    ring = make_ring_attention(seq_mesh, "sequence", causal=causal)
    out = ring(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_grads(seq_mesh):
    b, s, h, d = 1, 32, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    ring = make_ring_attention(seq_mesh, "sequence", causal=True)
    g_ring = jax.grad(lambda q: jnp.sum(ring(q, k, v) ** 2))(q)
    g_ref = jax.grad(lambda q: jnp.sum(attention_xla(q, k, v, causal=True) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_full(seq_mesh, causal):
    from paddlemix_tpu.parallel.ulysses import make_ulysses_attention

    b, s, h, d = 2, 64, 8, 16  # heads divisible by 8 devices
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    ref = attention_xla(q, k, v, causal=causal)
    fn = make_ulysses_attention(seq_mesh, "sequence", causal=causal)
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_flash_kernel_path(seq_mesh, causal, monkeypatch):
    """The blockwise Pallas ring path (per-step flash + base-2 lse merge)
    matches full attention — interpret mode stands in for the TPU."""
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PMIX_FORCE_PALLAS", "1")
    b, s, h, d = 1, 1024, 2, 8  # s_loc = 128 per device
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    ref = attention_xla(q, k, v, causal=causal)
    ring = make_ring_attention(seq_mesh, "sequence", causal=causal,
                               impl="flash")
    out = ring(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_ring_flash_matches_math_path_with_segments(seq_mesh, monkeypatch):
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")
    from paddlemix_tpu.parallel.ring_attention import ring_attention
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    b, s, h, d = 1, 1024, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    # two packed segments
    segs = jnp.where(jnp.arange(s)[None, :] < s // 2, 1, 2).astype(jnp.int32)
    spec = P(None, "sequence", None, None)
    sspec = P(None, "sequence")

    def run(impl):
        fn = shard_map(
            lambda q, k, v, qs, ks: ring_attention(
                q, k, v, "sequence", causal=False, q_segment_ids=qs,
                kv_segment_ids=ks, impl=impl),
            mesh=seq_mesh, in_specs=(spec, spec, spec, sspec, sspec),
            out_specs=spec, check_vma=False)
        return fn(q, k, v, segs, segs)

    np.testing.assert_allclose(np.asarray(run("flash")),
                               np.asarray(run("math")), atol=3e-5)
