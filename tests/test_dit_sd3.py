"""DiT + SD3 MM-DiT tests: shapes, CFG pipelines end-to-end, io round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers import (
    DDIMScheduler,
    DiTConfig,
    DiTModel,
    DiTPipeline,
    FlowMatchEulerDiscreteScheduler,
    SD3Transformer2DModel,
    SD3TransformerConfig,
    StableDiffusion3Pipeline,
)

TINY_DIT = DiTConfig(sample_size=8, patch_size=2, in_channels=4, out_channels=8,
                     hidden_size=32, num_layers=2, num_attention_heads=2, num_classes=10)

TINY_SD3 = SD3TransformerConfig(
    sample_size=8, patch_size=2, in_channels=4, out_channels=4, num_layers=2,
    attention_head_dim=8, num_attention_heads=4, joint_attention_dim=48,
    caption_projection_dim=32, pooled_projection_dim=32)


def test_dit_forward_and_io(tmp_path):
    model = DiTModel.from_config(TINY_DIT)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    out = model(x, jnp.asarray([10.0, 500.0]), jnp.asarray([1, 3], jnp.int32))
    assert out.shape == (2, 8, 8, 8)
    model.save_pretrained(str(tmp_path))
    model2 = DiTModel.from_pretrained(str(tmp_path))
    out2 = model2(x, jnp.asarray([10.0, 500.0]), jnp.asarray([1, 3], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_sd3_transformer_forward(tmp_path):
    model = SD3Transformer2DModel.from_config(TINY_SD3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 48))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    out = model(x, jnp.asarray([100.0, 900.0]), ctx, pooled)
    assert out.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
    model.save_pretrained(str(tmp_path))
    model2 = SD3Transformer2DModel.from_pretrained(str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(model2(x, jnp.asarray([100.0, 900.0]), ctx, pooled)),
        np.asarray(out), atol=1e-5)


def test_dit_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_vae

    pipe = DiTPipeline(transformer=DiTModel.from_config(TINY_DIT), vae=tiny_vae(),
                       scheduler=DDIMScheduler())
    images = pipe([1, 5], num_inference_steps=2, guidance_scale=4.0, output_type="np")[0]
    assert images.shape == (2, 16, 16, 3)
    assert np.isfinite(images).all()


def test_sd3_pipeline_without_t5():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae

    tok = tiny_tokenizer()
    cfg = TINY_SD3.replace(joint_attention_dim=48)
    pipe = StableDiffusion3Pipeline(
        transformer=SD3Transformer2DModel.from_config(cfg),
        scheduler=FlowMatchEulerDiscreteScheduler(),
        vae=tiny_vae(),
        text_encoder=tiny_text_encoder(tok, dim=16),
        tokenizer=tok,
        text_encoder_2=tiny_text_encoder(tok, with_projection=True, dim=16),
        tokenizer_2=tok,
    )
    images = pipe("a cat", height=32, width=32, num_inference_steps=2,
                  guidance_scale=5.0, output_type="np")[0]
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(images).all()


def test_controlnet_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae
    from paddlemix_tpu.diffusers import (
        ControlNetConfig,
        ControlNetModel,
        DDIMScheduler,
        StableDiffusionControlNetPipeline,
    )

    tok = tiny_tokenizer()
    cn = ControlNetModel.from_config(ControlNetConfig.from_dict(dict(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32, attention_head_dim=2,
        norm_num_groups=8, conditioning_embedding_out_channels=(8, 16))))
    pipe = StableDiffusionControlNetPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok), tokenizer=tok,
        unet=tiny_unet(), controlnet=cn, scheduler=DDIMScheduler())
    control = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    out = pipe("a cat", image=control, height=32, width=32, num_inference_steps=2,
               output_type="np")[0]
    assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()
    # zero-init output convs -> with fresh controlnet, result matches plain SD
    from paddlemix_tpu.diffusers import StableDiffusionPipeline

    plain = StableDiffusionPipeline(vae=pipe.vae, text_encoder=pipe.text_encoder,
                                    tokenizer=tok, unet=pipe.unet, scheduler=DDIMScheduler())
    a = pipe("x", image=control, height=32, width=32, num_inference_steps=2,
             output_type="latent", seed=5)[0]
    b = plain("x", height=32, width=32, num_inference_steps=2, output_type="latent", seed=5)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
