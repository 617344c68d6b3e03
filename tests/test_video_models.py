"""Spatio-temporal SVD stack tests: UNet, temporal-decoder VAE, pipeline e2e.

Mirrors the reference's fast tests for
models/unet_spatio_temporal_condition.py and
autoencoder_kl_temporal_decoder.py (tiny configs, shape/finiteness/grads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers.models import (
    AutoencoderKLTemporalDecoder,
    AutoencoderKLTemporalDecoderConfig,
    UNetSpatioTemporalConditionConfig,
    UNetSpatioTemporalConditionModel,
)

TINY_SVD_UNET = dict(
    in_channels=8,
    out_channels=4,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1,
    cross_attention_dim=24,
    num_attention_heads=(2, 4),
    transformer_layers_per_block=(1, 1),
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
    norm_num_groups=8,
    num_frames=2,
)


@pytest.fixture(scope="module")
def svd_unet():
    return UNetSpatioTemporalConditionModel.from_config(
        UNetSpatioTemporalConditionConfig.from_dict(TINY_SVD_UNET))


@pytest.fixture(scope="module")
def temporal_vae():
    cfg = AutoencoderKLTemporalDecoderConfig(
        block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2)
    return AutoencoderKLTemporalDecoder.from_config(cfg)


def test_svd_unet_forward(svd_unet):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 24))
    tids = jnp.asarray([[6.0, 127.0, 0.02]])
    out = jax.jit(svd_unet.module.apply)(
        {"params": svd_unet.params}, x, jnp.asarray(5), ctx, tids)
    assert out.shape == (1, 2, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_svd_unet_frames_interact(svd_unet):
    """Temporal layers couple frames: changing frame 1 changes frame 0's
    output (this is what the motion stand-in could fake but not match)."""
    ctx = jnp.ones((1, 1, 24))
    tids = jnp.ones((1, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 8))
    x2 = x.at[:, 1].add(1.0)
    o1 = svd_unet.module.apply({"params": svd_unet.params}, x, jnp.asarray(5), ctx, tids)
    o2 = svd_unet.module.apply({"params": svd_unet.params}, x2, jnp.asarray(5), ctx, tids)
    assert float(jnp.abs(o1[:, 0] - o2[:, 0]).max()) > 1e-6


def test_svd_unet_image_only_indicator(svd_unet):
    """With image_only_indicator=1 the learned_with_images AlphaBlender picks
    pure spatial features in every mixer."""
    ctx = jnp.ones((1, 1, 24))
    tids = jnp.ones((1, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 8))
    ind = jnp.ones((1, 2), jnp.float32)
    out = svd_unet.module.apply({"params": svd_unet.params}, x, jnp.asarray(5),
                                ctx, tids, image_only_indicator=ind)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_svd_unet_grads(svd_unet):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 8))
    ctx = jnp.ones((1, 1, 24))
    tids = jnp.ones((1, 3))

    def loss(p):
        return jnp.mean(svd_unet.module.apply({"params": p}, x, jnp.asarray(1),
                                              ctx, tids) ** 2)

    g = jax.grad(loss)(svd_unet.params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
    # the AlphaBlender mix factors are learned parameters
    flat = jax.tree_util.tree_leaves_with_path(g)
    assert any("mix_factor" in jax.tree_util.keystr(kp) for kp, _ in flat)


def test_temporal_vae_roundtrip(temporal_vae):
    px = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    post = temporal_vae.encode(px)
    assert post.mean.shape == (2, 8, 8, 4)
    dec = temporal_vae.decode(post.mode(), num_frames=2)
    assert dec.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(dec)))


def test_temporal_vae_save_load(temporal_vae, tmp_path):
    temporal_vae.save_pretrained(str(tmp_path))
    vae2 = AutoencoderKLTemporalDecoder.from_pretrained(str(tmp_path))
    px = jnp.ones((2, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(temporal_vae.decode(temporal_vae.encode(px).mode(), num_frames=2)),
        np.asarray(vae2.decode(vae2.encode(px).mode(), num_frames=2)), atol=1e-5)


def test_svd_pipeline_e2e(svd_unet, temporal_vae):
    from paddlemix_tpu.diffusers.pipelines import StableVideoDiffusionPipeline
    from paddlemix_tpu.diffusers.schedulers import EulerDiscreteScheduler

    pipe = StableVideoDiffusionPipeline(
        vae=temporal_vae, image_encoder=None, unet=svd_unet,
        scheduler=EulerDiscreteScheduler(num_train_timesteps=1000,
                                         beta_schedule="scaled_linear"))
    image = np.zeros((16, 16, 3), np.float32)
    frames, = pipe(image, num_frames=2, num_inference_steps=2,
                   max_guidance_scale=2.0)
    assert frames.shape == (1, 2, 16, 16, 3)
    assert np.isfinite(frames).all()
