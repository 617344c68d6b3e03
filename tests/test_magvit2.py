"""MAGVIT-v2 video tokenizer tests (tiny configs, CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.diffusers.models.magvit2 import (
    FSQ,
    LFQ,
    FrameDiscriminator,
    VideoTokenizer,
    hinge_d_loss,
    hinge_g_loss,
)

LAYERS = (
    "residual",
    "compress_space",
    ("consecutive_residual", 2),
    "linear_attend_space",
    "compress_space",
    "attend_space",
    "compress_time",
    "attend_time",
)


def tiny_tokenizer(**kw):
    cfg = dict(image_size=16, init_dim=8, max_dim=32, codebook_size=256,
               layers=LAYERS, attn_dim_head=4, attn_heads=2,
               linear_attn_dim_head=4, linear_attn_heads=2)
    cfg.update(kw)
    return VideoTokenizer(**cfg)


def test_roundtrip_shapes_and_loss():
    model = tiny_tokenizer()
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), video)
    out = model.apply(params, video, training=True)
    assert out["recon"].shape == video.shape
    # 2x space twice -> 4x4 fmap; 2x time with first-frame pad -> ceil
    assert out["codes"].shape[1:] == (3, 4, 4)
    assert np.isfinite(float(out["loss"]))
    assert float(out["recon_loss"]) > 0


def test_tokenize_decode_from_codes():
    model = tiny_tokenizer()
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), video)
    codes = model.apply(params, video, return_codes=True)
    assert codes.dtype in (jnp.int32, jnp.int64)
    assert int(codes.max()) < 256 and int(codes.min()) >= 0
    decoded = model.apply(params, codes,
                          method=VideoTokenizer.decode_from_code_indices)
    assert decoded.shape == video.shape


def test_encoder_is_temporally_causal():
    """Future frames must not affect earlier latents (conv-only config)."""
    model = VideoTokenizer(image_size=8, init_dim=8, codebook_size=16,
                           layers=("residual", "compress_time"))
    v1 = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8, 8, 3))
    v2 = v1.at[:, 3:].set(jax.random.normal(jax.random.PRNGKey(9),
                                            (1, 2, 8, 8, 3)))
    params = model.init(jax.random.PRNGKey(1), v1)
    l1 = model.apply(params, v1, method=VideoTokenizer.encode)
    l2 = model.apply(params, v2, method=VideoTokenizer.encode)
    # time pad=1 then stride-2: latent t=0,1 cover input frames <= 2
    np.testing.assert_allclose(np.asarray(l1[:, :2]), np.asarray(l2[:, :2]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, -1]), np.asarray(l2[:, -1]))


def test_jit_forward():
    model = tiny_tokenizer()
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), video)
    loss = jax.jit(lambda p, v: model.apply(p, v, training=True)["loss"])(
        params, video)
    assert np.isfinite(float(loss))


def test_lfq_codes_and_straight_through():
    lfq = LFQ(codebook_size=16, dim=12)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 12))
    params = lfq.init(jax.random.PRNGKey(1), z, training=True)
    out, idx, aux, breakdown = lfq.apply(params, z, training=True)
    assert out.shape == z.shape and idx.shape == (2, 7)
    assert int(idx.max()) < 16
    assert np.isfinite(float(aux))
    # gradient flows through the straight-through estimator
    g = jax.grad(lambda p, z: jnp.sum(lfq.apply(p, z, training=True)[0]),
                 argnums=1)(params, z)
    assert float(jnp.abs(g).sum()) > 0
    # indices_to_codes matches the sign pattern of the quantized latent
    codes = lfq.apply(params, idx, method=LFQ.indices_to_codes)
    assert codes.shape == out.shape


def test_lfq_indices_consistent_with_signs():
    lfq = LFQ(codebook_size=8)  # no projections: out IS the sign code
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    params = lfq.init(jax.random.PRNGKey(1), z)
    out, idx, _, _ = lfq.apply(params, z)
    codes = lfq.apply(params, idx, method=LFQ.indices_to_codes)
    np.testing.assert_allclose(np.asarray(jnp.sign(out)), np.asarray(codes))


def test_fsq_roundtrip():
    fsq = FSQ(levels=(8, 5, 5, 3))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 4)) * 2
    params = fsq.init(jax.random.PRNGKey(1), z)
    out, idx, aux, _ = fsq.apply(params, z)
    assert int(idx.max()) < 8 * 5 * 5 * 3
    codes = fsq.apply(params, idx, method=FSQ.indices_to_codes)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(out), atol=1e-6)


def test_discriminator_and_hinge_losses():
    disc = FrameDiscriminator(init_dim=8, num_blocks=2)
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16, 3))
    params = disc.init(jax.random.PRNGKey(1), video)
    logits = disc.apply(params, video)
    assert logits.shape[:2] == (1, 3)
    d = hinge_d_loss(logits, logits - 1.0)
    g = hinge_g_loss(logits)
    assert np.isfinite(float(d)) and np.isfinite(float(g))


def test_training_step_reduces_loss():
    import optax

    model = VideoTokenizer(image_size=8, init_dim=8, codebook_size=16,
                           layers=("residual", "compress_space"))
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 3)) * 0.1
    params = model.init(jax.random.PRNGKey(1), video)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, v):
        def loss_fn(p):
            return model.apply(p, v, training=True)["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, video)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_training_example_runs(tmp_path, monkeypatch):
    """examples/train_video_tokenizer.py end-to-end on a tiny config."""
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/train_video_tokenizer.py",
         "--steps", "3", "--image-size", "8", "--frames", "3",
         "--init-dim", "8", "--max-dim", "16", "--codebook-size", "16",
         "--batch", "1"],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "recon=" in out.stdout
