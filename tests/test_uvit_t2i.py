"""U-ViT t2i backbone tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.diffusers.models.uvit_t2i import UViTT2IConfig, UViTT2IModel

CFG = UViTT2IConfig(sample_size=16, patch_size=2, in_channels=4,
                    out_channels=4, num_layers=4, num_attention_heads=2,
                    attention_head_dim=8, clip_dim=12, num_text_tokens=5)


def test_forward_shape_and_jit():
    model = UViTT2IModel.from_config(CFG)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.asarray([3.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))
    out = jax.jit(lambda z, t, c: model(z, t, c))(z, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_conditions_output():
    model = UViTT2IModel.from_config(CFG)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 12))
    o1 = model(z, jnp.asarray([0.0]), ctx)
    o2 = model(z, jnp.asarray([900.0]), ctx)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_context_conditions_output():
    model = UViTT2IModel.from_config(CFG)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    c1 = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 12))
    c2 = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    assert not np.allclose(
        np.asarray(model(z, jnp.asarray([10.0]), c1)),
        np.asarray(model(z, jnp.asarray([10.0]), c2)))


def test_save_load_roundtrip(tmp_path):
    model = UViTT2IModel.from_config(CFG)
    model.save_pretrained(str(tmp_path))
    again = UViTT2IModel.from_pretrained(str(tmp_path))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jnp.zeros((1, 5, 12))
    np.testing.assert_allclose(
        np.asarray(model(z, jnp.asarray([1.0]), ctx)),
        np.asarray(again(z, jnp.asarray([1.0]), ctx)), atol=1e-6)


def test_training_example_runs():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_uvit_t2i.py",
         "--steps", "3", "--batch", "2", "--sample-size", "8",
         "--depth", "2", "--heads", "2", "--head-dim", "8",
         "--clip-dim", "8", "--text-tokens", "4"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout
