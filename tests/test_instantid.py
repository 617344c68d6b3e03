"""InstantID resampler + pipeline tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.diffusers.models import (
    ControlNetConfig,
    ControlNetModel,
    UNet2DConditionConfig,
    UNet2DConditionModel,
)
from paddlemix_tpu.diffusers.pipelines.instantid import (
    InstantIDResampler,
    InstantIDResamplerConfig,
    StableDiffusionXLInstantIDPipeline,
)
from paddlemix_tpu.diffusers.schedulers import EulerDiscreteScheduler
from tests.test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae

IP_TOKENS = 4


def tiny_resampler():
    return InstantIDResampler.from_config(InstantIDResamplerConfig(
        dim=16, depth=1, dim_head=8, heads=2, num_queries=IP_TOKENS,
        embedding_dim=12, output_dim=32))


def sdxl_kw(**extra):
    kw = dict(sample_size=8, block_out_channels=(16, 32),
              down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
              up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
              layers_per_block=1, cross_attention_dim=32,
              attention_head_dim=2, norm_num_groups=8,
              addition_embed_type="text_time", addition_time_embed_dim=8,
              projection_class_embeddings_input_dim=16 + 6 * 8)
    kw.update(extra)
    return kw


def test_resampler_shapes_and_zero_embedding():
    res = tiny_resampler()
    face = jax.random.normal(jax.random.PRNGKey(0), (2, 12))
    out = res(face)
    assert out.shape == (2, IP_TOKENS, 32)
    # zero embedding produces a distinct (uncond) token set
    out0 = res(jnp.zeros((2, 12)))
    assert not np.allclose(np.asarray(out), np.asarray(out0))
    assert np.isfinite(np.asarray(out0)).all()


@pytest.fixture(scope="module")
def iid_pipe():
    tok = tiny_tokenizer()
    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(
        sdxl_kw(ip_adapter_tokens=IP_TOKENS)))
    cn = ControlNetModel.from_config(ControlNetConfig.from_dict(
        sdxl_kw(conditioning_embedding_out_channels=(8, 16))))
    return StableDiffusionXLInstantIDPipeline(
        vae=tiny_vae(),
        text_encoder=tiny_text_encoder(tok, dim=16),
        text_encoder_2=tiny_text_encoder(tok, with_projection=True, dim=16),
        tokenizer=tok, tokenizer_2=tok, unet=unet,
        scheduler=EulerDiscreteScheduler(), controlnet=cn,
        image_proj_model=tiny_resampler())


def test_instantid_end_to_end(iid_pipe):
    face = np.random.RandomState(0).randn(12).astype(np.float32)
    keypoints = np.random.RandomState(1).rand(32, 32, 3).astype(np.float32)
    images = iid_pipe("a person", image_embeds=face, image=keypoints,
                      height=32, width=32, num_inference_steps=2,
                      guidance_scale=5.0, output_type="np")[0]
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(images).all()


def test_instantid_identity_changes_output(iid_pipe):
    keypoints = np.random.RandomState(1).rand(32, 32, 3).astype(np.float32)
    f1 = np.random.RandomState(0).randn(12).astype(np.float32)
    f2 = np.random.RandomState(9).randn(12).astype(np.float32)
    l1 = iid_pipe("a person", image_embeds=f1, image=keypoints, height=32,
                  width=32, num_inference_steps=2, output_type="latent",
                  seed=3)[0]
    l2 = iid_pipe("a person", image_embeds=f2, image=keypoints, height=32,
                  width=32, num_inference_steps=2, output_type="latent",
                  seed=3)[0]
    assert float(np.abs(np.asarray(l1) - np.asarray(l2)).max()) > 1e-4


def test_instantid_input_validation(iid_pipe):
    with pytest.raises(ValueError):
        iid_pipe("a person", image=np.zeros((32, 32, 3)))
    with pytest.raises(ValueError):
        iid_pipe("a person", image_embeds=np.zeros(12))
