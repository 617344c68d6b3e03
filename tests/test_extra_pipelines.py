"""E2E tiny tests for the round-2 pipeline additions: DDPM/DDIM, RePaint,
consistency models, LDM super-resolution, T2I-Adapter, Paint-by-Example,
unCLIP. Mirrors the reference's fast pipeline tests (tiny from-config
components, shape + finiteness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers.models import (
    AutoencoderKL,
    AutoencoderKLConfig,
    PriorTransformer,
    PriorTransformerConfig,
    T2IAdapter,
    T2IAdapterConfig,
    UNet2DConditionConfig,
    UNet2DConditionModel,
    VQModel,
    VQModelConfig,
)
from paddlemix_tpu.diffusers.schedulers import (
    CMStochasticIterativeScheduler,
    DDIMScheduler,
    DDPMScheduler,
    RePaintScheduler,
    UnCLIPScheduler,
)

UNCOND_UNET = dict(
    sample_size=16, in_channels=3, out_channels=3,
    block_out_channels=(16, 32),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1, cross_attention_dim=8, norm_num_groups=8,
)

COND_UNET = dict(
    sample_size=16, block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, cross_attention_dim=24, attention_head_dim=2,
    norm_num_groups=8,
)

TINY_VAE = dict(block_out_channels=(16, 32), layers_per_block=1,
                norm_num_groups=8, sample_size=32)


def _unet(cfg):
    return UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(cfg))


class _FakeImageEncoder:
    """Stands in for the CLIP image tower (encode_image -> (B, D))."""

    def __init__(self, dim):
        self.dim = dim

    def encode_image(self, px):
        return jnp.mean(px, axis=(1, 2)) @ jnp.ones((px.shape[-1], self.dim)) * 0.1


def test_ddpm_and_ddim_pipelines():
    from paddlemix_tpu.diffusers.pipelines import DDIMPipeline, DDPMPipeline

    unet = _unet(UNCOND_UNET)
    out, = DDPMPipeline(unet=unet, scheduler=DDPMScheduler(
        num_train_timesteps=100, clip_sample=True))(
        batch_size=1, num_inference_steps=3)
    assert out.shape == (1, 16, 16, 3) and np.isfinite(out).all()
    out, = DDIMPipeline(unet=unet, scheduler=DDIMScheduler(
        num_train_timesteps=100))(batch_size=1, num_inference_steps=3)
    assert out.shape == (1, 16, 16, 3) and np.isfinite(out).all()


def test_repaint_pipeline_keeps_known():
    from paddlemix_tpu.diffusers.pipelines import RePaintPipeline

    unet = _unet(UNCOND_UNET)
    pipe = RePaintPipeline(unet=unet, scheduler=RePaintScheduler(
        num_train_timesteps=50))
    image = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32) * 2 - 1
    mask = np.ones((16, 16), np.float32)  # everything known
    out, = pipe(image, mask, num_inference_steps=10, jump_length=3,
                jump_n_sample=2)
    assert out.shape == (1, 16, 16, 3)
    # fully-known mask: result is the original image (in [0,1] space)
    np.testing.assert_allclose(out[0], (image + 1) / 2, atol=5e-2)


def test_consistency_model_pipeline():
    from paddlemix_tpu.diffusers.pipelines import ConsistencyModelPipeline

    unet = _unet(UNCOND_UNET)
    pipe = ConsistencyModelPipeline(unet=unet,
                                    scheduler=CMStochasticIterativeScheduler(
                                        sigma_max=20.0))
    out, = pipe(batch_size=1, num_inference_steps=2)
    assert out.shape == (1, 16, 16, 3) and np.isfinite(out).all()


def test_ldm_super_resolution_pipeline():
    from paddlemix_tpu.diffusers.pipelines import LDMSuperResolutionPipeline

    vq = VQModel.from_config(VQModelConfig(block_out_channels=(16,),
                                           layers_per_block=1,
                                           norm_num_groups=8, latent_channels=3))
    unet = _unet(dict(UNCOND_UNET, in_channels=6, out_channels=3))
    pipe = LDMSuperResolutionPipeline(vqvae=vq, unet=unet,
                                      scheduler=DDIMScheduler(
                                          num_train_timesteps=100))
    low = np.zeros((16, 16, 3), np.float32)
    out, = pipe(low, num_inference_steps=2)
    assert out.ndim == 4 and np.isfinite(out).all()


def _tiny_tokenizer(max_len=16):
    from paddlemix_tpu.models.clip import CLIPTokenizer
    from paddlemix_tpu.models.clip.tokenizer import bytes_to_unicode

    vocab = {}
    for tk in bytes_to_unicode().values():
        vocab[tk] = len(vocab)
        vocab[tk + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return CLIPTokenizer(vocab, [], model_max_length=max_len)


def _tiny_text_encoder(tok, dim=24):
    from paddlemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel

    return CLIPTextModel.from_config(CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=dim, intermediate_size=dim * 2,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        eos_token_id=tok.eos_token_id, projection_dim=dim), seed=0)


def test_t2i_adapter_pipeline():
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionAdapterPipeline

    unet = _unet(COND_UNET)
    # TINY_VAE downscales 2x, so the adapter trunk matches with factor 2
    # (latent 32x32 -> block features 32, 16)
    adapter = T2IAdapter.from_config(T2IAdapterConfig(
        channels=(16, 32), num_res_blocks=1, downscale_factor=2))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    tok = _tiny_tokenizer()
    pipe = StableDiffusionAdapterPipeline(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok, unet=unet,
        adapter=adapter, scheduler=DDIMScheduler(num_train_timesteps=100))
    cond = np.zeros((64, 64, 3), np.float32)
    out, = pipe("a sketch", image=cond, height=64, width=64,
                num_inference_steps=2, output_type="np")
    assert np.isfinite(np.asarray(out)).all()


def test_adapter_features_change_output():
    """The intrablock residual hook is live: different condition images give
    different outputs for identical latents."""
    from paddlemix_tpu.diffusers.models import T2IAdapter as TA

    unet = _unet(COND_UNET)
    adapter = TA.from_config(T2IAdapterConfig(channels=(16, 32),
                                              num_res_blocks=1,
                                              downscale_factor=8))
    x = jnp.ones((1, 16, 16, 4))
    ctx = jnp.ones((1, 4, 24))
    f1 = adapter(jnp.zeros((1, 128, 128, 3)))
    f2 = adapter(jnp.ones((1, 128, 128, 3)))
    o1 = unet.module.apply({"params": unet.params}, x, jnp.asarray(5), ctx,
                           down_intrablock_additional_residuals=f1)
    o2 = unet.module.apply({"params": unet.params}, x, jnp.asarray(5), ctx,
                           down_intrablock_additional_residuals=f2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_paint_by_example_pipeline():
    from paddlemix_tpu.diffusers.pipelines import PaintByExamplePipeline

    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    unet = _unet(dict(COND_UNET, in_channels=9))
    pipe = PaintByExamplePipeline(
        vae=vae, image_encoder=_FakeImageEncoder(24), unet=unet,
        scheduler=DDIMScheduler(num_train_timesteps=100))
    img = np.zeros((32, 32, 3), np.float32)
    mask = np.ones((32, 32), np.float32)
    example = np.ones((32, 32, 3), np.float32)
    out, = pipe(example, img, mask, num_inference_steps=2)
    assert out.shape[1:] == (32, 32, 3) and np.isfinite(out).all()


def test_unclip_pipeline():
    from paddlemix_tpu.diffusers.pipelines import UnCLIPPipeline, UnCLIPTextProjModel
    from paddlemix_tpu.diffusers.pipelines.unclip import UnCLIPTextProjConfig

    tok = _tiny_tokenizer()
    prior = PriorTransformer.from_config(PriorTransformerConfig(
        embedding_dim=16, num_layers=2, num_attention_heads=2,
        attention_head_dim=8, num_embeddings=16))
    decoder = _unet(dict(COND_UNET, in_channels=3, out_channels=3,
                         addition_embed_type="image", encoder_hid_dim=64))
    text_proj = UnCLIPTextProjModel.from_config(UnCLIPTextProjConfig(
        clip_embeddings_dim=16, clip_extra_context_tokens=2,
        cross_attention_dim=24, time_embed_dim=64))
    text = _tiny_text_encoder(tok, dim=16)
    sr = _unet(dict(UNCOND_UNET, sample_size=32, in_channels=6, out_channels=3))

    pipe = UnCLIPPipeline(
        prior=prior, decoder=decoder, text_proj=text_proj, text_encoder=text,
        tokenizer=tok,
        prior_scheduler=UnCLIPScheduler(num_train_timesteps=100,
                                        clip_sample=False),
        decoder_scheduler=UnCLIPScheduler(num_train_timesteps=100),
        super_res_first=sr,
        super_res_scheduler=UnCLIPScheduler(num_train_timesteps=100))
    out, = pipe("a cat", num_inference_steps=2, prior_num_inference_steps=2,
                super_res_num_inference_steps=2)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()


def test_semantic_stable_diffusion_pipeline():
    from paddlemix_tpu.diffusers.pipelines import SemanticStableDiffusionPipeline

    tok = _tiny_tokenizer()
    unet = _unet(COND_UNET)
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    pipe = SemanticStableDiffusionPipeline(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=unet, scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe("a photo", editing_prompt=["sunglasses", "smile"],
                reverse_editing_direction=[False, True],
                edit_warmup_steps=1, height=32, width=32,
                num_inference_steps=3, output_type="np")
    assert np.isfinite(np.asarray(out)).all()
    # guidance changes the result vs plain SD with the same seed
    plain, = pipe("a photo", height=32, width=32, num_inference_steps=3,
                  output_type="np")
    assert np.abs(np.asarray(out) - np.asarray(plain)).max() > 1e-6


def test_safe_stable_diffusion_pipeline():
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionPipelineSafe

    tok = _tiny_tokenizer()
    unet = _unet(COND_UNET)
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    pipe = StableDiffusionPipelineSafe(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=unet, scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe("a photo", height=32, width=32, num_inference_steps=3,
                sld_warmup_steps=0, output_type="np")
    assert np.isfinite(np.asarray(out)).all()

    # the reference SafetyConfig presets map 1:1 onto __call__ kwargs
    # (ppdiffusers/pipelines/stable_diffusion_safe/__init__.py:35-63)
    from paddlemix_tpu.diffusers.pipelines import SafetyConfig

    for preset in (SafetyConfig.WEAK, SafetyConfig.MAX):
        out, = pipe("a photo", height=32, width=32, num_inference_steps=2,
                    output_type="np", **preset)
        assert np.isfinite(np.asarray(out)).all()


def test_mel_roundtrip_and_audio_diffusion():
    from paddlemix_tpu.diffusers.pipelines import AudioDiffusionPipeline, Mel

    mel = Mel(x_res=16, y_res=16, n_fft=256, hop_length=64)
    # a sine wave yields a concentrated spectrogram band
    t = np.arange(mel.slice_len) / mel.sr
    wave = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    img = mel.spectrogram(wave)
    assert img.shape == (16, 16) and img.max() > 200
    audio = mel.image_to_audio(img, n_iter=4)
    assert np.isfinite(audio).all() and audio.shape[0] > 0

    unet = _unet(dict(UNCOND_UNET, in_channels=1, out_channels=1))
    pipe = AudioDiffusionPipeline(unet=unet,
                                  scheduler=DDIMScheduler(num_train_timesteps=100),
                                  mel=mel)
    images, audios = pipe(num_inference_steps=2)
    assert images.shape == (1, 16, 16)
    assert np.isfinite(audios).all()


class _FakeQFormer:
    """Stands in for the BLIP-2 image->query-token stack."""

    def __init__(self, n_query, dim):
        self.n_query, self.dim = n_query, dim

    def encode_image(self, px):
        b = px.shape[0]
        base = jnp.mean(px, axis=(1, 2, 3))[:, None, None]
        return jnp.broadcast_to(base, (b, self.n_query, self.dim)) * 0.1


def test_blip_diffusion_pipeline():
    from paddlemix_tpu.diffusers.pipelines import (
        BlipDiffusionPipeline,
        ContextCLIPTextModel,
    )
    from paddlemix_tpu.models.clip import CLIPTextConfig

    tok = _tiny_tokenizer()
    text = ContextCLIPTextModel.from_config(CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=24,
        eos_token_id=tok.eos_token_id), seed=0)
    unet = _unet(COND_UNET)
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    pipe = BlipDiffusionPipeline(
        vae=vae, text_encoder=text, tokenizer=tok, unet=unet,
        scheduler=DDIMScheduler(num_train_timesteps=100),
        qformer=_FakeQFormer(4, 24))
    ref_img = np.ones((32, 32, 3), np.float32)
    out, = pipe("a dog", ref_img, height=32, width=32, num_inference_steps=2)
    assert np.isfinite(np.asarray(out)).all()
    # subject grounding is live: a different reference image changes the output
    out2, = pipe("a dog", ref_img * 0.0, height=32, width=32,
                 num_inference_steps=2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_context_clip_splices_tokens():
    from paddlemix_tpu.diffusers.pipelines import ContextCLIPTextModel
    from paddlemix_tpu.models.clip import CLIPTextConfig

    model = ContextCLIPTextModel.from_config(CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=16), seed=0)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    ctx = jnp.ones((1, 3, 16))
    out = model(ids, ctx_embeddings=ctx)
    assert out.shape == (1, 7, 16)  # 4 tokens + 3 spliced context tokens
    plain = model(ids)
    assert plain.shape == (1, 4, 16)


def test_hotshot_xl_pipeline():
    from paddlemix_tpu.diffusers.models import UNetMotionConfig, UNetMotionModel
    from paddlemix_tpu.diffusers.pipelines import HotshotXLPipeline
    from paddlemix_tpu.models.clip import CLIPTextModelWithProjection, CLIPTextConfig

    tok = _tiny_tokenizer()

    def tiny_proj_encoder(dim):
        return CLIPTextModelWithProjection.from_config(CLIPTextConfig(
            vocab_size=tok.vocab_size, hidden_size=dim,
            intermediate_size=dim * 2, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            eos_token_id=tok.eos_token_id, projection_dim=dim), seed=0)

    unet = UNetMotionModel.from_config(UNetMotionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=24, attention_head_dim=2,
        norm_num_groups=8, num_frames=2, motion_num_heads=2,
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=12 + 6 * 8)))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    pipe = HotshotXLPipeline(
        vae=vae, text_encoder=tiny_proj_encoder(12),
        text_encoder_2=tiny_proj_encoder(12), tokenizer=tok, tokenizer_2=tok,
        unet=unet, scheduler=DDIMScheduler(num_train_timesteps=100))
    frames, = pipe("a gif of a cat", num_frames=2, height=32, width=32,
                   num_inference_steps=2)
    assert frames.shape[:2] == (1, 2) and np.isfinite(frames).all()


def test_latent_family_pipelines():
    from paddlemix_tpu.diffusers.pipelines import (
        KarrasVePipeline,
        LatentConsistencyModelPipeline,
        LDMPipeline,
        LDMTextToImagePipeline,
        PNDMPipeline,
        ScoreSdeVePipeline,
    )
    from paddlemix_tpu.diffusers.schedulers import (
        KarrasVeScheduler,
        LCMScheduler,
        PNDMScheduler,
        ScoreSdeVeScheduler,
    )
    from paddlemix_tpu.models.bert import BertConfig, BertModel

    uncond = _unet(UNCOND_UNET)

    out, = PNDMPipeline(unet=uncond, scheduler=PNDMScheduler(
        num_train_timesteps=100))(batch_size=1, num_inference_steps=4)
    assert np.isfinite(out).all()

    out, = ScoreSdeVePipeline(unet=uncond, scheduler=ScoreSdeVeScheduler(
        sigma_max=10.0))(batch_size=1, num_inference_steps=3)
    assert np.isfinite(out).all()

    out, = KarrasVePipeline(unet=uncond, scheduler=KarrasVeScheduler(
        sigma_max=10.0, s_churn=2.0, s_max=5.0))(
        batch_size=1, num_inference_steps=3)
    assert np.isfinite(out).all()

    vq = VQModel.from_config(VQModelConfig(block_out_channels=(16,),
                                           layers_per_block=1,
                                           norm_num_groups=8,
                                           latent_channels=3))
    out, = LDMPipeline(vqvae=vq, unet=uncond,
                       scheduler=DDIMScheduler(num_train_timesteps=100))(
        batch_size=1, num_inference_steps=2)
    assert np.isfinite(out).all()

    bert = BertModel.from_config(BertConfig(
        vocab_size=320, hidden_size=24, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=32), seed=0)

    class _BertTok:
        def __call__(self, texts):
            return {"input_ids": np.full((len(texts), 8), 5, np.int64)}

    cond_unet = _unet(dict(COND_UNET, in_channels=3, out_channels=3))
    out, = LDMTextToImagePipeline(
        vqvae=vq, bert=bert, tokenizer=_BertTok(), unet=cond_unet,
        scheduler=DDIMScheduler(num_train_timesteps=100))(
        "a painting", height=32, width=32, num_inference_steps=2,
        guidance_scale=2.0)
    assert np.isfinite(out).all()

    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    tok = _tiny_tokenizer()
    out, = LatentConsistencyModelPipeline(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=_unet(COND_UNET), scheduler=LCMScheduler(
            num_train_timesteps=100))(
        "a cat", height=32, width=32, num_inference_steps=2)
    assert np.isfinite(out).all()


def test_sd_variant_pipelines():
    from paddlemix_tpu.diffusers.pipelines import (
        CycleDiffusionPipeline,
        StableDiffusionImageVariationPipeline,
        StableDiffusionInstructPix2PixPipeline,
        StableDiffusionUpscalePipeline,
    )
    from paddlemix_tpu.diffusers.schedulers import DDPMScheduler

    tok = _tiny_tokenizer()
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    text = _tiny_text_encoder(tok)

    # instruct-pix2pix: 8-channel UNet, dual guidance
    unet8 = _unet(dict(COND_UNET, in_channels=8))
    pipe = StableDiffusionInstructPix2PixPipeline(
        vae=vae, text_encoder=text, tokenizer=tok, unet=unet8,
        scheduler=DDIMScheduler(num_train_timesteps=100))
    img = np.zeros((32, 32, 3), np.float32)
    out, = pipe("make it sunny", image=img, num_inference_steps=2,
                output_type="np")
    assert np.isfinite(np.asarray(out)).all()

    # image variation
    pipe = StableDiffusionImageVariationPipeline(
        vae=vae, image_encoder=_FakeImageEncoder(24), unet=_unet(COND_UNET),
        scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe(np.ones((32, 32, 3), np.float32), height=32, width=32,
                num_inference_steps=2)
    assert np.isfinite(out).all()

    # x4 upscale: low-res rides the channels, noise level as class cond
    unet7 = _unet(dict(COND_UNET, in_channels=7, out_channels=4,
                       num_class_embeds=100))
    pipe = StableDiffusionUpscalePipeline(
        vae=vae, text_encoder=text, tokenizer=tok, unet=unet7,
        scheduler=DDPMScheduler(num_train_timesteps=100, clip_sample=False))
    out, = pipe("a photo", image=np.zeros((16, 16, 3), np.float32),
                num_inference_steps=2, noise_level=5)
    assert np.isfinite(out).all()

    # cycle diffusion: invert + re-denoise
    pipe = CycleDiffusionPipeline(
        vae=vae, text_encoder=text, tokenizer=tok, unet=_unet(COND_UNET),
        scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe("a cat", source_prompt="a dog",
                image=np.zeros((32, 32, 3), np.float32),
                num_inference_steps=2, output_type="np")
    assert np.isfinite(np.asarray(out)).all()


def test_versatile_diffusion_trio():
    from paddlemix_tpu.diffusers.pipelines import (
        VersatileDiffusionDualGuidedPipeline,
        VersatileDiffusionImageVariationPipeline,
        VersatileDiffusionTextToImagePipeline,
    )

    tok = _tiny_tokenizer()
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    unet = _unet(COND_UNET)
    text = _tiny_text_encoder(tok)
    kw = dict(vae=vae, unet=unet,
              scheduler=DDIMScheduler(num_train_timesteps=100),
              tokenizer=tok, text_encoder=text,
              image_encoder=_FakeImageEncoder(24))

    out, = VersatileDiffusionTextToImagePipeline(**kw)(
        "a cat", height=32, width=32, num_inference_steps=2)
    assert np.isfinite(out).all()

    img = np.ones((32, 32, 3), np.float32)
    out, = VersatileDiffusionImageVariationPipeline(**kw)(
        img, height=32, width=32, num_inference_steps=2)
    assert np.isfinite(out).all()

    dual = VersatileDiffusionDualGuidedPipeline(**kw)
    out_a, = dual("a cat", img, text_to_image_strength=1.0, height=32,
                  width=32, num_inference_steps=2)
    out_b, = dual("a cat", img, text_to_image_strength=0.0, height=32,
                  width=32, num_inference_steps=2)
    assert np.isfinite(out_a).all()
    # the mixing ratio is live
    assert np.abs(out_a - out_b).max() > 1e-6


def test_video_to_video_pipeline():
    from paddlemix_tpu.diffusers.models import UNetMotionConfig, UNetMotionModel
    from paddlemix_tpu.diffusers.pipelines import VideoToVideoPipeline

    tok = _tiny_tokenizer()
    unet = UNetMotionModel.from_config(UNetMotionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=24, attention_head_dim=2,
        norm_num_groups=8, num_frames=2, motion_num_heads=2)))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    pipe = VideoToVideoPipeline(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=unet, scheduler=DDIMScheduler(num_train_timesteps=100))
    video = np.zeros((2, 32, 32, 3), np.float32)
    out, = pipe("make it anime", video=video, strength=0.5,
                num_inference_steps=4)
    assert out.shape == (1, 2, 32, 32, 3)
    assert np.isfinite(out).all()


def test_diffedit_pipeline():
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionDiffEditPipeline

    tok = _tiny_tokenizer()
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    pipe = StableDiffusionDiffEditPipeline(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=_unet(COND_UNET), scheduler=DDIMScheduler(
            num_train_timesteps=100, clip_sample=False))
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    mask = pipe.generate_mask(img, "a dog", "a cat", num_maps=2)
    assert mask.shape == (1, 16, 16)
    assert set(np.unique(np.asarray(mask))).issubset({0.0, 1.0})
    traj = pipe.invert(img, "a dog", num_inference_steps=3)
    assert traj.shape == (4, 1, 16, 16, 4)
    out, = pipe("a cat", mask_image=mask, image_latents=traj,
                num_inference_steps=3, output_type="np")
    assert np.isfinite(np.asarray(out)).all()


def test_gligen_pipeline():
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionGLIGENPipeline

    from flax import traverse_util

    tok = _tiny_tokenizer()
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    unet = _unet(dict(COND_UNET, attention_type="gated"))
    flat = traverse_util.flatten_dict(unet.params)
    fuser_keys = [k for k in flat if "fuser" in ".".join(k)]
    assert fuser_keys, "gated attention created no fuser params"
    # GLIGEN inits the gates at 0 (grounding off); open them so the test can
    # observe the box conditioning
    for k in fuser_keys:
        if k[-1] in ("alpha_attn", "alpha_dense"):
            flat[k] = jnp.asarray(1.0)
    unet.params = traverse_util.unflatten_dict(flat)
    pipe = StableDiffusionGLIGENPipeline(
        vae=vae, text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=unet, scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe("a cat and a dog", gligen_phrases=["a cat", "a dog"],
                gligen_boxes=[[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]],
                height=32, width=32, num_inference_steps=3,
                gligen_scheduled_sampling_beta=0.7, output_type="np")
    assert np.isfinite(np.asarray(out)).all()
    # grounding is live: different boxes change the output
    out2, = pipe("a cat and a dog", gligen_phrases=["a cat", "a dog"],
                 gligen_boxes=[[0.5, 0.5, 0.7, 0.7], [0.0, 0.0, 0.2, 0.2]],
                 height=32, width=32, num_inference_steps=3,
                 gligen_scheduled_sampling_beta=0.7, output_type="np")
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0


def test_kandinsky_21_pipeline():
    from paddlemix_tpu.diffusers.models import VQModel, VQModelConfig
    from paddlemix_tpu.diffusers.pipelines import KandinskyPipeline

    tok = _tiny_tokenizer()
    movq = VQModel.from_config(VQModelConfig(
        block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
        latent_channels=4))
    unet = _unet(dict(COND_UNET, out_channels=8))  # learned variance
    pipe = KandinskyPipeline(
        text_encoder=_tiny_text_encoder(tok), tokenizer=tok, unet=unet,
        scheduler=DDIMScheduler(num_train_timesteps=100), movq=movq)
    out, = pipe("a red cat", image_embeds=jnp.ones((1, 16)), height=32,
                width=32, num_inference_steps=2)
    assert np.isfinite(np.asarray(out)).all()


def test_sdxl_img2img_and_inpaint():
    from paddlemix_tpu.diffusers.pipelines import (
        StableDiffusionXLImg2ImgPipeline,
        StableDiffusionXLInpaintPipeline,
    )
    from paddlemix_tpu.models.clip import CLIPTextConfig, CLIPTextModelWithProjection

    tok = _tiny_tokenizer()

    def proj_enc(dim):
        return CLIPTextModelWithProjection.from_config(CLIPTextConfig(
            vocab_size=tok.vocab_size, hidden_size=dim,
            intermediate_size=dim * 2, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            eos_token_id=tok.eos_token_id, projection_dim=dim), seed=0)

    sdxl_unet = _unet(dict(
        sample_size=16, block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, cross_attention_dim=24, attention_head_dim=2,
        use_linear_projection=True, addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=12 + 6 * 8, norm_num_groups=8))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    kw = dict(vae=vae, text_encoder=proj_enc(12), text_encoder_2=proj_enc(12),
              tokenizer=tok, tokenizer_2=tok, unet=sdxl_unet,
              scheduler=DDIMScheduler(num_train_timesteps=100))

    img = np.zeros((32, 32, 3), np.float32)
    out, = StableDiffusionXLImg2ImgPipeline(**kw)(
        "a photo", image=img, strength=0.5, num_inference_steps=4,
        output_type="np")
    assert np.isfinite(np.asarray(out)).all()

    mask = np.ones((32, 32), np.float32)
    out, = StableDiffusionXLInpaintPipeline(**kw)(
        "a photo", image=img, mask_image=mask, num_inference_steps=3,
        output_type="np")
    assert np.isfinite(np.asarray(out)).all()
