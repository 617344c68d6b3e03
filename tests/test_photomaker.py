"""PhotoMaker ID-encoder + pipeline tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.diffusers.pipelines.photomaker import (
    FuseModule,
    PhotoMakerIDEncoder,
    PhotoMakerIDEncoderConfig,
    PhotoMakerStableDiffusionXLPipeline,
)
from paddlemix_tpu.diffusers.schedulers import EulerDiscreteScheduler
from tests.test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

TINY_VISION = dict(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                   num_attention_heads=2, patch_size=8, image_size=16,
                   projection_dim=16)


def tiny_id_encoder(embed_dim=32):
    cfg = PhotoMakerIDEncoderConfig(
        vision_config=TINY_VISION, embed_dim=embed_dim,
        projection_dim=embed_dim // 2, projection_dim_2=embed_dim // 2)
    return PhotoMakerIDEncoder.from_config(cfg)


def test_fuse_module_replaces_only_masked_positions():
    fuse = FuseModule(embed_dim=8)
    prompt = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8))
    ids = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8))
    mask = jnp.asarray([[0, 1, 1, 0, 0, 0]], jnp.int32)
    params = fuse.init(jax.random.PRNGKey(2), prompt, ids, mask)
    out = fuse.apply(params, prompt, ids, mask)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0], np.asarray(prompt)[0, 0])
    np.testing.assert_allclose(out[0, 3:], np.asarray(prompt)[0, 3:])
    assert not np.allclose(out[0, 1], np.asarray(prompt)[0, 1])
    # masked position i consumes id embedding i: swapping the ids changes
    # position 1 vs 2 differently
    out2 = np.asarray(fuse.apply(params, prompt, ids[:, ::-1], mask))
    assert not np.allclose(out[0, 1], out2[0, 1])


def test_id_encoder_shapes():
    enc = tiny_id_encoder()
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32))
    mask = jnp.asarray([[0, 1, 1, 0, 0, 0]], jnp.int32)
    out = enc(px, prompt, mask)
    assert out.shape == (1, 6, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def pm_pipe():
    tok = tiny_tokenizer()
    return PhotoMakerStableDiffusionXLPipeline(
        vae=tiny_vae(),
        text_encoder=tiny_text_encoder(tok, dim=16),
        text_encoder_2=tiny_text_encoder(tok, with_projection=True, dim=16),
        tokenizer=tok, tokenizer_2=tok,
        unet=tiny_unet(ctx_dim=32, sdxl=True),
        scheduler=EulerDiscreteScheduler(),
        id_encoder=tiny_id_encoder(embed_dim=32),
        trigger_word="img")


def test_trigger_word_encoding(pm_pipe):
    cond, pooled, mask = pm_pipe.encode_prompt_with_trigger_word(
        "a man img walking", num_id_images=2)
    assert cond.shape[0] == 1 and cond.shape[-1] == 32
    m = np.asarray(mask)[0]
    assert m.sum() == 2  # class token duplicated per id image
    # positions are contiguous
    on = np.nonzero(m)[0]
    assert on[1] == on[0] + 1
    with pytest.raises(ValueError):
        pm_pipe.encode_prompt_with_trigger_word("no trigger here", 1)


def test_photomaker_end_to_end(pm_pipe):
    ref = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    images = pm_pipe("a man img walking", input_id_images=[ref],
                     height=32, width=32, num_inference_steps=2,
                     guidance_scale=5.0, output_type="np")[0]
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(images).all()


def test_photomaker_requires_id_images(pm_pipe):
    with pytest.raises(ValueError):
        pm_pipe("a man img walking")
