"""Pipeline parallelism (GPipe over ppermute) and expert-parallel MoE tests
on the virtual 8-device CPU mesh (conftest sets it up)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.parallel.mesh import MeshConfig, create_mesh
from paddlemix_tpu.parallel.pipeline import make_pipeline_forward, stack_stage_params
from paddlemix_tpu.parallel.moe import MoEFeedForward


def _layer(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def test_gpipe_matches_sequential():
    n_stages, layers_per_stage, d = 4, 2, 16
    mesh = create_mesh(MeshConfig(1, 1, 1, 1, n_stages, 1),
                       devices=jax.devices()[:n_stages])
    key = jax.random.PRNGKey(0)
    per_layer = []
    for i in range(n_stages * layers_per_stage):
        k1, k2, key = jax.random.split(key, 3)
        per_layer.append((jax.random.normal(k1, (d, d)) * 0.3,
                          jax.random.normal(k2, (d,)) * 0.1))
    stacked = stack_stage_params(per_layer, n_stages)

    def stage_fn(stage_params, x):
        def body(x, lp):
            return _layer(lp, x), None
        out, _ = jax.lax.scan(body, x, stage_params)
        return out

    batch = jax.random.normal(key, (8, d))
    fwd = make_pipeline_forward(mesh, stage_fn, num_microbatches=4)
    with mesh:
        out = jax.jit(fwd)(stacked, batch)

    ref = batch
    for lp in per_layer:
        ref = _layer(lp, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_gpipe_grads_flow():
    n_stages, d = 2, 8
    mesh = create_mesh(MeshConfig(1, 1, 1, 1, n_stages, 1),
                       devices=jax.devices()[:n_stages])
    key = jax.random.PRNGKey(1)
    per_layer = [(jax.random.normal(jax.random.fold_in(key, i), (d, d)) * 0.3,
                  jnp.zeros((d,))) for i in range(n_stages)]
    stacked = stack_stage_params(per_layer, n_stages)

    def stage_fn(sp, x):
        out, _ = jax.lax.scan(lambda x, lp: (_layer(lp, x), None), x, sp)
        return out

    batch = jax.random.normal(key, (4, d))
    fwd = make_pipeline_forward(mesh, stage_fn, num_microbatches=2)

    def loss(params):
        return (fwd(params, batch) ** 2).sum()

    def ref_loss(params):
        x = batch
        for i in range(n_stages):
            x = stage_fn(jax.tree.map(lambda p: p[i], params), x)
        return (x ** 2).sum()

    with mesh:
        g = jax.jit(jax.grad(loss))(stacked)
    g_ref = jax.grad(ref_loss)(stacked)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_moe_expert_parallel_matches_single_device():
    d, e = 8, 4
    moe = MoEFeedForward(num_experts=e, hidden_mult=2, top_k=2,
                         capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, d))
    params = moe.init(jax.random.PRNGKey(3), x)["params"]
    ref = moe.apply({"params": params}, x)

    mesh = create_mesh(MeshConfig(1, 1, 1, 1, 1, 4), devices=jax.devices()[:4])
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = lambda p, spec: jax.device_put(p, NamedSharding(mesh, spec))
    sharded = {
        "router": shard(params["router"], P()),
        "wi": shard(params["wi"], P("expert")),
        "wo": shard(params["wo"], P("expert")),
    }
    with mesh:
        out = jax.jit(lambda p, x: moe.apply({"params": p}, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_moe_capacity_drops_and_aux_loss():
    moe = MoEFeedForward(num_experts=2, hidden_mult=1, top_k=1,
                         capacity_factor=0.5)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 4))
    params = moe.init(jax.random.PRNGKey(5), x)["params"]
    out, inter = moe.apply({"params": params}, x, mutable=["intermediates"])
    assert out.shape == x.shape
    aux = inter["intermediates"]["moe_aux_loss"][0]
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_ia3_and_adalora():
    import optax
    from paddlemix_tpu.peft import (
        AdaLoraConfig, IA3Config, adalora_init, adalora_loss_fn,
        adalora_merge_params, allocator_init, allocator_update, ia3_init,
        ia3_loss_fn, ia3_merge_params)

    params = {"layer": {"to_k": {"kernel": jnp.ones((8, 8))},
                        "fc2": {"kernel": jnp.ones((8, 8))},
                        "to_q": {"kernel": jnp.ones((8, 8))}}}

    # IA3: identity at init, axis semantics when scaled
    cfg = IA3Config()
    ia3 = ia3_init(params, cfg)
    assert set(ia3) == {("layer", "to_k", "kernel"), ("layer", "fc2", "kernel")}
    eff = ia3_merge_params(params, ia3, cfg)
    np.testing.assert_allclose(np.asarray(eff["layer"]["to_k"]["kernel"]), 1.0)
    ia3[("layer", "to_k", "kernel")]["l"] = jnp.arange(8, dtype=jnp.float32)
    eff = ia3_merge_params(params, ia3, cfg)
    np.testing.assert_allclose(np.asarray(eff["layer"]["to_k"]["kernel"][0]),
                               np.arange(8))  # output-axis scaling
    ia3[("layer", "fc2", "kernel")]["l"] = jnp.arange(8, dtype=jnp.float32)
    eff = ia3_merge_params(params, ia3, cfg)
    np.testing.assert_allclose(np.asarray(eff["layer"]["fc2"]["kernel"][:, 0]),
                               np.arange(8))  # input-axis scaling

    def base_loss(p, batch, rng):
        return jnp.sum((batch @ p["layer"]["to_k"]["kernel"] @
                        p["layer"]["fc2"]["kernel"]) ** 2) * 1e-3

    batch = jnp.ones((2, 8))
    loss_fn = ia3_loss_fn(base_loss, params, cfg)
    g = jax.grad(loss_fn)(ia3_init(params, cfg), batch, None)
    assert float(jnp.abs(g[("layer", "to_k", "kernel")]["l"]).sum()) > 0

    # AdaLoRA: init delta is zero; allocator prunes to target budget
    acfg = AdaLoraConfig(init_r=4, target_r=1)
    ada = adalora_init(params, acfg, jax.random.PRNGKey(0))
    eff = adalora_merge_params(params, ada, acfg)
    np.testing.assert_allclose(np.asarray(eff["layer"]["to_q"]["kernel"]), 1.0)
    for path in ada:
        ada[path]["e"] = jnp.arange(1, 5, dtype=jnp.float32)
    aloss = adalora_loss_fn(base_loss, params, acfg)
    grads = jax.grad(aloss)(ada, batch, None)
    state = allocator_init(ada)
    ada2, state = allocator_update(ada, grads, state, step=10, total_steps=10,
                                   config=acfg)
    total_kept = sum(float(f["mask"].sum()) for f in ada2.values())
    assert total_kept == acfg.target_r * len(ada)


def test_fid_and_clip_score():
    from paddlemix_tpu.metrics.fid_clip_score import compute_fid

    rng = np.random.RandomState(0)
    a = rng.randn(256, 16)
    # identical distributions -> ~0; shifted -> ~ ||shift||^2
    assert compute_fid(a, a.copy()) < 1e-6
    b = a + 3.0
    fid = compute_fid(a, b)
    assert abs(fid - 9.0 * 16) < 1.0


def test_value_guided_rl_planning():
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.experimental import ValueGuidedRLPipeline
    from paddlemix_tpu.diffusers.models import UNet1DConfig, UNet1DModel

    state_dim, action_dim, horizon = 6, 2, 32
    ch = state_dim + action_dim
    unet = UNet1DModel.from_config(UNet1DConfig(
        sample_size=horizon, in_channels=ch, out_channels=ch,
        block_out_channels=(8, 8, 16)))
    # value function: same 1D net; value = sum of its output
    value_fn = UNet1DModel.from_config(UNet1DConfig(
        sample_size=horizon, in_channels=ch, out_channels=1,
        block_out_channels=(8, 8, 16)), seed=1)
    pipe = ValueGuidedRLPipeline(value_fn, unet, DDPMScheduler(),
                                 state_dim=state_dim, action_dim=action_dim)
    action = pipe(np.zeros(state_dim, np.float32), batch_size=4,
                  planning_horizon=horizon, n_guide_steps=1,
                  num_inference_steps=2)
    assert action.shape == (action_dim,)
    assert np.isfinite(action).all()
