"""Pipeline tests: tiny-component SD + SDXL end-to-end, save/load round-trip.

Mirrors the reference's fast pipeline tests
(ppdiffusers/tests/pipelines/stable_diffusion/test_stable_diffusion.py:
tiny randomly-init components, assert output shapes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers import (
    AutoencoderKL,
    AutoencoderKLConfig,
    DDIMScheduler,
    DiffusionPipeline,
    EulerDiscreteScheduler,
    StableDiffusionPipeline,
    StableDiffusionXLPipeline,
    UNet2DConditionConfig,
    UNet2DConditionModel,
)
from paddlemix_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPTextModelWithProjection,
    CLIPTokenizer,
)
from paddlemix_tpu.models.clip.tokenizer import bytes_to_unicode


def tiny_tokenizer(max_len=16):
    vocab = {}
    for s in bytes_to_unicode().values():
        vocab[s] = len(vocab)
        vocab[s + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return CLIPTokenizer(vocab, [], model_max_length=max_len)


def tiny_text_encoder(tok, with_projection=False, dim=32):
    cfg = CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=dim, intermediate_size=dim * 2,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        eos_token_id=tok.eos_token_id, projection_dim=dim,
    )
    cls = CLIPTextModelWithProjection if with_projection else CLIPTextModel
    return cls.from_config(cfg, seed=0)


def tiny_vae():
    return AutoencoderKL.from_config(AutoencoderKLConfig(
        block_out_channels=(8, 16), down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4))


def tiny_unet(ctx_dim=32, sdxl=False):
    kw = dict(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=ctx_dim, attention_head_dim=2,
        norm_num_groups=8,
    )
    if sdxl:
        kw.update(addition_embed_type="text_time", addition_time_embed_dim=8,
                  projection_class_embeddings_input_dim=16 + 6 * 8)
    return UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(kw))


@pytest.fixture(scope="module")
def sd_pipe():
    tok = tiny_tokenizer()
    return StableDiffusionPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok), tokenizer=tok,
        unet=tiny_unet(), scheduler=DDIMScheduler())


def test_sd_pipeline_end_to_end(sd_pipe):
    images = sd_pipe("a cat", height=32, width=32, num_inference_steps=3,
                     guidance_scale=7.5, output_type="np", seed=0)[0]
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(images).all() and images.min() >= 0.0 and images.max() <= 1.0


def test_sd_pipeline_batch_and_nocfg(sd_pipe):
    images = sd_pipe(["a cat", "a dog"], height=32, width=32, num_inference_steps=2,
                     guidance_scale=1.0, output_type="np")[0]
    assert images.shape == (2, 32, 32, 3)


def test_sd_pipeline_latent_output_deterministic(sd_pipe):
    l1 = sd_pipe("x", height=32, width=32, num_inference_steps=2, output_type="latent", seed=3)[0]
    l2 = sd_pipe("x", height=32, width=32, num_inference_steps=2, output_type="latent", seed=3)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    l3 = sd_pipe("x", height=32, width=32, num_inference_steps=2, output_type="latent", seed=4)[0]
    assert float(np.abs(np.asarray(l1) - np.asarray(l3)).max()) > 1e-3


def test_sd_pipeline_euler(sd_pipe):
    pipe = StableDiffusionPipeline(
        vae=sd_pipe.vae, text_encoder=sd_pipe.text_encoder, tokenizer=sd_pipe.tokenizer,
        unet=sd_pipe.unet, scheduler=EulerDiscreteScheduler())
    images = pipe("a cat", height=32, width=32, num_inference_steps=3, output_type="np")[0]
    assert images.shape == (1, 32, 32, 3) and np.isfinite(images).all()


def test_sd_pipeline_save_load_roundtrip(sd_pipe, tmp_path):
    sd_pipe.save_pretrained(str(tmp_path))
    pipe2 = DiffusionPipeline.from_pretrained(str(tmp_path))
    assert isinstance(pipe2, StableDiffusionPipeline)
    a = sd_pipe("y", height=32, width=32, num_inference_steps=2, output_type="latent", seed=1)[0]
    assert pipe2.tokenizer is not None  # vocab.json/merges.txt persisted
    b = pipe2("y", height=32, width=32, num_inference_steps=2, output_type="latent", seed=1)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sdxl_pipeline_end_to_end():
    tok = tiny_tokenizer()
    pipe = StableDiffusionXLPipeline(
        vae=tiny_vae(),
        text_encoder=tiny_text_encoder(tok, dim=16),
        text_encoder_2=tiny_text_encoder(tok, with_projection=True, dim=16),
        tokenizer=tok, tokenizer_2=tok,
        unet=tiny_unet(ctx_dim=32, sdxl=True),
        scheduler=EulerDiscreteScheduler())
    images = pipe("a cat", height=32, width=32, num_inference_steps=2,
                  guidance_scale=5.0, output_type="np")[0]
    assert images.shape == (1, 32, 32, 3) and np.isfinite(images).all()


def test_img2img_pipeline(sd_pipe):
    from paddlemix_tpu.diffusers import StableDiffusionImg2ImgPipeline

    pipe = StableDiffusionImg2ImgPipeline(
        vae=sd_pipe.vae, text_encoder=sd_pipe.text_encoder, tokenizer=sd_pipe.tokenizer,
        unet=sd_pipe.unet, scheduler=sd_pipe.scheduler)
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    out = pipe("a cat", image=img, strength=0.6, num_inference_steps=4, output_type="np")[0]
    assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()


def test_inpaint_pipeline(sd_pipe):
    from paddlemix_tpu.diffusers import StableDiffusionInpaintPipeline

    pipe = StableDiffusionInpaintPipeline(
        vae=sd_pipe.vae, text_encoder=sd_pipe.text_encoder, tokenizer=sd_pipe.tokenizer,
        unet=sd_pipe.unet, scheduler=sd_pipe.scheduler)
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 255
    out = pipe("a cat", image=img, mask_image=mask, num_inference_steps=3,
               output_type="np")[0]
    assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()


def test_textual_inversion(sd_pipe, tmp_path):
    import numpy as _np
    from safetensors.numpy import save_file

    from paddlemix_tpu.diffusers.loaders import load_textual_inversion

    dim = sd_pipe.text_encoder.config.hidden_size
    vec = _np.random.RandomState(0).randn(2, dim).astype(_np.float32)
    save_file({"emb": vec}, str(tmp_path / "learned_embeds.safetensors"))
    old_vocab = sd_pipe.text_encoder.config.vocab_size
    tokens = load_textual_inversion(sd_pipe, str(tmp_path), token="<concept>")
    assert len(tokens) == 2
    assert sd_pipe.text_encoder.config.vocab_size == old_vocab + 2
    ids = sd_pipe.tokenizer(["a photo of <concept>"])["input_ids"]
    assert (ids >= old_vocab).any()
    # pipeline still runs with the new token
    out = sd_pipe("a photo of <concept>", height=32, width=32, num_inference_steps=2,
                  output_type="latent")[0]
    assert np.isfinite(np.asarray(out)).all()


def test_auto_pipeline_task_remap(tmp_path, sd_pipe):
    from paddlemix_tpu.diffusers import (AutoPipelineForImage2Image,
                                         AutoPipelineForText2Image)
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionImg2ImgPipeline

    path = str(tmp_path / "sd")
    sd_pipe.save_pretrained(path)
    t2i = AutoPipelineForText2Image.from_pretrained(path)
    assert type(t2i).__name__ == "StableDiffusionPipeline"
    i2i = AutoPipelineForImage2Image.from_pretrained(path)
    assert isinstance(i2i, StableDiffusionImg2ImgPipeline)
