"""MiniGPT4 + ImageBind tests."""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.models.imagebind import ImageBindConfig, ImageBindModel
from paddlemix_tpu.models.minigpt4 import MiniGPT4Config, MiniGPT4ForConditionalGeneration


def test_minigpt4():
    cfg = MiniGPT4Config.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=16, patch_size=8),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64, cross_attention_frequency=2,
                            encoder_hidden_size=32),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64,
                         eos_token_id=2),
        num_query_tokens=4, image_token_id=63))
    model = MiniGPT4ForConditionalGeneration.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    ids = np.full((1, 8), 5, np.int32)
    ids[:, 1:5] = 63
    logits, _ = model(jnp.asarray(ids), px)
    assert logits.shape == (1, 8, 64)
    out = model.generate(ids, px, max_new_tokens=3)
    assert out.shape == (1, 3)


def test_imagebind_all_modalities():
    cfg = ImageBindConfig(embed_dim=32, modality_configs={
        m: dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=64, input_size=(16 if m not in ("text", "imu") else
                                                  (8 if m == "text" else 32)),
                patch_size=8, vocab_size=64)
        for m in ("vision", "text", "audio", "depth", "thermal", "imu")})
    # fix per-modality stem params clobbered above
    cfg.modality_configs["vision"]["in_channels"] = 3
    cfg.modality_configs["audio"].update(in_channels=1, num_mel_bins=16,
                                         stride=8)
    cfg.modality_configs["depth"]["in_channels"] = 1
    cfg.modality_configs["thermal"]["in_channels"] = 1
    cfg.modality_configs["imu"]["in_channels"] = 6

    model = ImageBindModel.from_config(cfg, seed=0)
    inputs = {
        "vision": jnp.zeros((2, 16, 16, 3)),
        "text": jnp.ones((2, 8), jnp.int32),
        "audio": jnp.zeros((2, 16, 16, 1)),
        "depth": jnp.zeros((2, 16, 16, 1)),
        "thermal": jnp.zeros((2, 16, 16, 1)),
        "imu": jnp.zeros((2, 32, 6)),
    }
    embeds = model(inputs)
    assert set(embeds) == set(inputs)
    for m, e in embeds.items():
        assert e.shape == (2, 32), m
        assert bool(jnp.all(jnp.isfinite(e))), m
    # postprocessors: fixed logit scales (reference :499-522) mean the
    # embedding norms are exactly the per-modality scale
    assert abs(float(jnp.linalg.norm(embeds["vision"][0])) - 1.0) < 1e-3
    assert abs(float(jnp.linalg.norm(embeds["audio"][0])) - 20.0) < 1e-2
    assert abs(float(jnp.linalg.norm(embeds["depth"][0])) - 5.0) < 1e-3
    assert abs(float(jnp.linalg.norm(embeds["thermal"][0])) - 10.0) < 1e-2
    # vision stem is the PadIm2Video + Conv3D path: a 5D video input of the
    # same frames must produce the identical embedding as the 4D image
    vid = jnp.repeat(inputs["vision"][:, None], 2, axis=1)
    e_vid = model.encode("vision", vid)
    np.testing.assert_allclose(np.asarray(e_vid),
                               np.asarray(embeds["vision"]), atol=1e-5)
    # cross-modal similarity is computable
    sim = embeds["vision"] @ embeds["text"].T
    assert sim.shape == (2, 2)


def test_swin_backbone():
    from paddlemix_tpu.models.groundingdino import SwinBackbone, SwinConfig

    cfg = SwinConfig(patch_size=4, embed_dim=16, depths=(1, 1, 1), num_heads=(2, 2, 2),
                     window_size=4, out_indices=(0, 1, 2))
    swin = SwinBackbone(cfg)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = swin.init(jax.random.PRNGKey(0), px)["params"]
    outs = swin.apply({"params": params}, px)
    assert [o.shape for o in outs] == [(1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64)]


def test_groundingdino_end_to_end():
    from paddlemix_tpu.models.groundingdino import GroundingDinoConfig, GroundingDinoModel

    cfg = GroundingDinoConfig(
        swin_config=dict(patch_size=4, embed_dim=16, depths=(1, 1, 1),
                         num_heads=(2, 2, 2), window_size=4, out_indices=(0, 1, 2)),
        text_vocab_size=100, text_hidden_size=32, text_layers=1, text_heads=2,
        max_text_len=16, hidden_size=32, num_heads=2, num_feature_levels=3,
        num_encoder_layers=1, num_decoder_layers=2, num_queries=10, num_points=2,
        ffn_dim=64)
    model = GroundingDinoModel.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ids = jnp.asarray([[2, 5, 9, 4, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    out = model(px, ids, mask)
    assert out["pred_boxes"].shape == (1, 10, 4)
    assert out["pred_logits"].shape == (1, 10, 6)
    assert bool(jnp.all(jnp.isfinite(out["pred_boxes"])))
    assert bool(jnp.all((out["pred_boxes"] >= 0) & (out["pred_boxes"] <= 1)))
    # masked text positions are suppressed in logits
    assert float(out["pred_logits"][0, :, 4:].max()) <= -1e8


def test_audioldm_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet
    from paddlemix_tpu.diffusers import AudioLDMPipeline, DDIMScheduler
    from paddlemix_tpu.diffusers.models import AutoencoderKL, AutoencoderKLConfig
    from paddlemix_tpu.models.audioldm import HiFiGANConfig, HiFiGANVocoder

    tok = tiny_tokenizer()
    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        in_channels=1, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4))
    vocoder = HiFiGANVocoder.from_config(HiFiGANConfig(
        model_in_dim=16, upsample_initial_channel=32,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
    pipe = AudioLDMPipeline(vae=vae, text_encoder=tiny_text_encoder(tok),
                            tokenizer=tok, unet=tiny_unet(), scheduler=DDIMScheduler(),
                            vocoder=vocoder)
    audio = pipe("a dog barking", audio_length_in_s=0.032, num_inference_steps=2)[0]
    assert audio.ndim == 2 and audio.shape[0] == 1
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0


def test_hifigan_upsampling():
    from paddlemix_tpu.models.audioldm import HiFiGANConfig, HiFiGANVocoder

    cfg = HiFiGANConfig(model_in_dim=16, upsample_initial_channel=32,
                        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    voc = HiFiGANVocoder.from_config(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    wav = voc.decode(mel)
    assert wav.shape == (2, 10 * cfg.hop_length)


def test_cogvlm_vision_expert():
    from paddlemix_tpu.models.cogvlm import CogVLMConfig, CogVLMForCausalLM

    cfg = CogVLMConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=16, patch_size=8),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        image_token_id=63))
    model = CogVLMForCausalLM.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    n_img = 4 + 2  # boi + patches + eoi
    ids = np.full((1, n_img + 4), 5, np.int32)
    ids[:, 1:1 + n_img] = 63
    logits = model(jnp.asarray(ids), px)
    assert logits.shape == (1, n_img + 4, 64)
    # vision expert params exist and are distinct from language expert
    # (reference checkpoint names, modeling.py:218-227)
    flat = {".".join(map(str, k)) for k in
            __import__("flax").traverse_util.flatten_dict(model.params)}
    assert any("vision_expert_query_key_value" in k for k in flat)
    assert any("language_expert_query_key_value" in k for k in flat)
    assert any("vision_mlp" in k and "gate_proj" in k for k in flat)
    # EVA2CLIP tower artifacts: GLU adapter + boi/eoi boundary embeddings
    assert any("linear_proj" in k for k in flat)
    assert any(k.endswith("boi") for k in flat)
    # image path changes output only at/after image positions
    logits2 = model(jnp.asarray(ids), px + 1.0)
    assert float(jnp.abs(logits - logits2).max()) > 1e-4


def test_cogvlm_expert_mask_and_positions():
    from paddlemix_tpu.models.cogvlm.modeling import (
        build_position_ids,
        get_expert_mask,
    )

    # spans: L L V V V V L (the Vs = boi, 2 patches, eoi in prompt terms)
    is_v = jnp.asarray([[0, 0, 1, 1, 1, 1, 0]], bool)
    vm, lm = get_expert_mask(is_v)
    # last vision token of the span routes as LANGUAGE (reference :115-122)
    assert vm.tolist() == [[False, False, True, True, True, False, False]]
    assert lm.tolist() == [[True, True, False, False, False, True, True]]
    # positions: INTERIOR vision tokens share one position; boi/eoi count as
    # language steps (reference :459-476)
    pos = build_position_ids(is_v)
    assert pos.tolist() == [[0, 1, 2, 3, 3, 4, 5]]


def test_cogagent_cross_branch():
    from paddlemix_tpu.models.cogvlm import CogVLMConfig, CogVLMForCausalLM

    cfg = CogVLMConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=16, patch_size=8),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        image_token_id=63, variant="cogagent",
        cross_hidden_size=24, cross_compute_hidden_size=24,
        cross_image_size=32,
        cross_vision_config=dict(width=24, layers=1, head_width=12,
                                 mlp_ratio=2.0, image_size=32,
                                 patch_size=16)))
    model = CogVLMForCausalLM.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    cross_px = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    n_img = 4 + 2
    ids = np.full((1, n_img + 4), 5, np.int32)
    ids[:, 1:1 + n_img] = 63
    logits = model(jnp.asarray(ids), px, cross_images=cross_px)
    assert logits.shape == (1, n_img + 4, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # the high-res branch feeds every layer: different cross image -> change
    logits2 = model(jnp.asarray(ids), px, cross_images=cross_px + 1.0)
    assert float(jnp.abs(logits - logits2).max()) > 1e-5


def test_text_to_video():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae
    from paddlemix_tpu.diffusers import (DDIMScheduler, TextToVideoPipeline,
                                         UNetMotionConfig, UNetMotionModel)

    tok = tiny_tokenizer()
    unet = UNetMotionModel.from_config(UNetMotionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32, attention_head_dim=2,
        norm_num_groups=8, num_frames=4, motion_num_heads=2)))
    pipe = TextToVideoPipeline(vae=tiny_vae(), text_encoder=tiny_text_encoder(tok),
                               tokenizer=tok, unet=unet, scheduler=DDIMScheduler())
    video = pipe("a cat walking", num_frames=4, height=32, width=32,
                 num_inference_steps=2)[0]
    assert video.shape == (1, 4, 32, 32, 3)
    assert np.isfinite(video).all()
    # temporal attention makes frames interdependent: different seeds differ
    v2 = pipe("a cat walking", num_frames=4, height=32, width=32,
              num_inference_steps=2, seed=1)[0]
    assert float(np.abs(video - v2).max()) > 1e-4


def test_internlm_xcomposer2_plora():
    from paddlemix_tpu.models.internlm_xcomposer2 import IXC2Config, IXC2ForCausalLM

    cfg = IXC2Config.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=16, patch_size=8),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        image_token_id=63, plora_rank=2))
    model = IXC2ForCausalLM.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    ids = np.full((1, 8), 5, np.int32)
    ids[:, 1:5] = 63
    logits = model(jnp.asarray(ids), px)
    assert logits.shape == (1, 8, 64)
    # PLoRA branches exist under the reference checkpoint names (fused wqkv +
    # wo + w1/w2/w3, Plora_A/Plora_B; reference modeling.py:173-217,372-415)
    from flax import traverse_util

    flat = {".".join(map(str, k)) for k in traverse_util.flatten_dict(model.params)}
    assert any("wqkv.Plora_A" in k for k in flat)
    assert any("wo.Plora_B" in k for k in flat)
    assert any(".w1.Plora_A" in k for k in flat)
    assert any("attention_norm" in k for k in flat)


def test_visualglm():
    from paddlemix_tpu.models.visualglm import (ChatGLMConfig, ChatGLMForCausalLM,
                                                VisualGLMConfig,
                                                VisualGLMForConditionalGeneration)

    glm = ChatGLMForCausalLM.from_config(ChatGLMConfig(
        vocab_size=64, hidden_size=32, ffn_hidden_size=64, num_layers=2,
        num_attention_heads=2, multi_query_group_num=1))
    logits = glm(jnp.asarray([[1, 5, 9, 11]], jnp.int32))
    assert logits.shape == (1, 4, 64)

    cfg = VisualGLMConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=16, patch_size=8),
        qformer_config=dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64, cross_attention_frequency=1,
                            encoder_hidden_size=32),
        text_config=dict(vocab_size=64, hidden_size=32, ffn_hidden_size=64,
                         num_layers=1, num_attention_heads=2, multi_query_group_num=1),
        num_query_tokens=4, image_token_id=63))
    model = VisualGLMForConditionalGeneration.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    ids = np.full((1, 8), 5, np.int32)
    ids[:, 1:5] = 63
    logits = model(jnp.asarray(ids), px)
    assert logits.shape == (1, 8, 64)
    logits2 = model(jnp.asarray(ids), px + 1.0)
    assert float(jnp.abs(logits - logits2).max()) > 1e-4


def test_deepfloyd_if_cascade():
    import sys
    sys.path.insert(0, "tests")
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import UNet2DConditionConfig, UNet2DConditionModel
    from paddlemix_tpu.diffusers.pipelines import IFPipeline, IFSuperResolutionPipeline
    from paddlemix_tpu.models.t5 import T5Config, T5EncoderModel

    class TinyT5Tok:
        def __call__(self, texts, **kw):
            ids = np.full((len(texts), 6), 3, np.int32)
            return {"input_ids": ids, "attention_mask": np.ones_like(ids)}

    t5 = T5EncoderModel.from_config(T5Config(vocab_size=32, d_model=16, d_kv=4,
                                             d_ff=32, num_layers=1, num_heads=4,
                                             relative_attention_num_buckets=8))
    stage1_unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(dict(
        sample_size=16, in_channels=3, out_channels=6,  # epsilon + variance
        block_out_channels=(16, 32), down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=8)))
    pipe1 = IFPipeline(unet=stage1_unet, scheduler=DDPMScheduler(),
                       text_encoder=t5, tokenizer=TinyT5Tok())
    low = pipe1("a cat", num_inference_steps=2, output_type="latent")[0]
    assert low.shape == (1, 16, 16, 3)

    stage2_unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(dict(
        sample_size=32, in_channels=6, out_channels=6,  # 3 latent + 3 upscaled
        block_out_channels=(16, 32), down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=8)))
    pipe2 = IFSuperResolutionPipeline(unet=stage2_unet, scheduler=DDPMScheduler(),
                                      text_encoder=t5, tokenizer=TinyT5Tok())
    hi = pipe2(image=low, prompt="a cat", num_inference_steps=2, output_type="np")[0]
    assert hi.shape == (1, 32, 32, 3)
    assert np.isfinite(hi).all()


def test_kandinsky_cascade():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import (PriorTransformer, PriorTransformerConfig,
                                                UNet2DConditionConfig, UNet2DConditionModel,
                                                VQModel, VQModelConfig)
    from paddlemix_tpu.diffusers.pipelines import (KandinskyV22Pipeline,
                                                   KandinskyV22PriorPipeline)

    tok = tiny_tokenizer()
    text_enc = tiny_text_encoder(tok, dim=16)
    prior = PriorTransformer.from_config(PriorTransformerConfig(
        num_attention_heads=2, attention_head_dim=8, num_layers=2,
        embedding_dim=16, num_embeddings=16))
    prior_pipe = KandinskyV22PriorPipeline(prior=prior, image_encoder=None,
                                           text_encoder=text_enc, tokenizer=tok,
                                           scheduler=DDPMScheduler(clip_sample=False))
    image_embeds, neg_embeds = prior_pipe("a cat", num_inference_steps=2)
    assert image_embeds.shape == (1, 16)

    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(dict(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(16, 32), down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=8,
        addition_embed_type="image", encoder_hid_dim_type="image_proj",
        encoder_hid_dim=16)))
    movq = VQModel.from_config(VQModelConfig(
        block_out_channels=(8, 16), down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4, num_vq_embeddings=32))
    pipe = KandinskyV22Pipeline(unet=unet, scheduler=DDPMScheduler(clip_sample=False),
                                movq=movq)
    images = pipe(image_embeds, height=32, width=32, num_inference_steps=2,
                  output_type="np")[0]
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(images).all()


def test_vq_model_roundtrip():
    from paddlemix_tpu.diffusers.models import VQModel, VQModelConfig

    vq = VQModel.from_config(VQModelConfig(
        block_out_channels=(8, 16), down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4, num_vq_embeddings=32))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    rec, zq, idx = vq(x)
    assert rec.shape == x.shape
    assert idx.shape == (1, 16, 16)
    assert int(idx.max()) < 32


def test_image_to_video_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_vae
    from paddlemix_tpu.diffusers import DDIMScheduler, UNetMotionConfig, UNetMotionModel
    from paddlemix_tpu.diffusers.pipelines import ImageToVideoPipeline

    unet = UNetMotionModel.from_config(UNetMotionConfig.from_dict(dict(
        sample_size=8, in_channels=8, out_channels=4,  # 4 latent + 4 cond
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
        norm_num_groups=8, num_frames=4, motion_num_heads=2)))
    pipe = ImageToVideoPipeline(vae=tiny_vae(), image_encoder=None, unet=unet,
                                scheduler=DDIMScheduler())
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32) * 2 - 1
    video = pipe(img, num_frames=4, num_inference_steps=2, output_type="np")[0]
    assert video.shape == (1, 4, 32, 32, 3)
    assert np.isfinite(video).all()


def test_wuerstchen_end_to_end():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer
    from paddlemix_tpu.diffusers.models import (
        PaellaVQConfig, PaellaVQModel, WuerstchenDiffNeXt,
        WuerstchenDiffNeXtConfig, WuerstchenPrior, WuerstchenPriorConfig)
    from paddlemix_tpu.diffusers.schedulers import DDPMWuerstchenScheduler
    from paddlemix_tpu.diffusers.pipelines import WuerstchenCombinedPipeline

    tok = tiny_tokenizer()
    text_enc = tiny_text_encoder(tok, dim=16)
    prior = WuerstchenPrior.from_config(WuerstchenPriorConfig(
        c_in=4, c=32, c_cond=16, c_r=8, depth=2, nhead=2))
    decoder = WuerstchenDiffNeXt.from_config(WuerstchenDiffNeXtConfig(
        c_in=4, c_out=4, c_r=8, patch_size=2, c_cond=16,
        c_hidden=(16, 32), nhead=(-1, 2), blocks=(1, 1),
        level_config=("CT", "CTA"), inject_effnet=(False, True),
        effnet_embd=4, clip_embd=16))
    vqgan = PaellaVQModel.from_config(PaellaVQConfig(
        levels=2, bottleneck_blocks=1, embed_dim=16, latent_channels=4,
        num_vq_embeddings=32))

    # VQ roundtrip: 32px -> (8, 8, 4) latents -> 32px
    x = jnp.zeros((1, 32, 32, 3))
    z = vqgan.encode(x)
    assert z.shape == (1, 8, 8, 4)
    rec = vqgan.decode(z, force_not_quantize=False)
    assert rec.shape == x.shape

    pipe = WuerstchenCombinedPipeline(
        tokenizer=tok, text_encoder=text_enc, decoder=decoder,
        scheduler=DDPMWuerstchenScheduler(), vqgan=vqgan,
        prior_prior=prior)
    image = pipe("a red cube", height=128, width=128,
                 prior_num_inference_steps=2, num_inference_steps=2,
                 guidance_scale=0.0, output_type="np")[0]
    assert image.shape == (1, 128, 128, 3)
    assert np.isfinite(image).all()


def test_stable_cascade_end_to_end():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer
    from paddlemix_tpu.diffusers.models import (
        PaellaVQConfig, PaellaVQModel, StableCascadeUNet, StableCascadeUNetConfig)
    from paddlemix_tpu.diffusers.schedulers import DDPMWuerstchenScheduler
    from paddlemix_tpu.diffusers.pipelines import StableCascadeCombinedPipeline

    tok = tiny_tokenizer()
    text_enc = tiny_text_encoder(tok, with_projection=True, dim=16)
    prior = StableCascadeUNet.from_config(StableCascadeUNetConfig(
        c_in=4, c_out=4, c_r=8, patch_size=1, c_cond=16, c_hidden=(16, 16),
        nhead=(2, 2), blocks_down=(1, 1), blocks_up=(1, 1),
        level_config=("CTA", "CTA"), c_clip_text=16, c_clip_text_pooled=16,
        c_clip_img=8, c_clip_seq=2, switch_level=(False,)))
    decoder = StableCascadeUNet.from_config(StableCascadeUNet.stage_b_config(
        c_in=4, c_out=4, c_r=8, patch_size=2, c_cond=16, c_hidden=(16, 32),
        nhead=(-1, 2), blocks_down=(1, 1), blocks_up=(1, 1),
        block_repeat_down=(1, 1), block_repeat_up=(2, 1),
        level_config=("CT", "CTA"), c_clip=16, c_clip_seq=2, c_effnet=4,
        c_pixels=3, switch_level=(False,)))
    vqgan = PaellaVQModel.from_config(PaellaVQConfig(
        levels=2, bottleneck_blocks=1, embed_dim=16, latent_channels=4,
        num_vq_embeddings=32, scale_factor=0.43))

    pipe = StableCascadeCombinedPipeline(
        tokenizer=tok, text_encoder=text_enc, decoder=decoder,
        scheduler=DDPMWuerstchenScheduler(), vqgan=vqgan, prior_prior=prior)
    image = pipe("a blue sphere", height=128, width=128,
                 prior_num_inference_steps=2, num_inference_steps=2,
                 guidance_scale=0.0, output_type="np")[0]
    assert image.shape == (1, 128, 128, 3)
    assert np.isfinite(image).all()


def test_audioldm2_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_tokenizer
    from paddlemix_tpu.diffusers import DDIMScheduler
    from paddlemix_tpu.diffusers.models import AutoencoderKL, AutoencoderKLConfig
    from paddlemix_tpu.diffusers.pipelines import AudioLDM2Pipeline
    from paddlemix_tpu.models.audioldm import HiFiGANConfig, HiFiGANVocoder
    from paddlemix_tpu.models.audioldm2 import (
        AudioLDM2ProjectionConfig, AudioLDM2ProjectionModel, AudioLDM2UNet,
        AudioLDM2UNetConfig, ClapTextConfig, ClapTextModelWithProjection)
    from paddlemix_tpu.models.gpt2 import GPT2Config, GPT2Model
    from paddlemix_tpu.models.t5 import T5Config, T5EncoderModel

    tok = tiny_tokenizer()
    clap = ClapTextModelWithProjection.from_config(ClapTextConfig(
        vocab_size=tok.vocab_size, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=64,
        projection_dim=12))
    t5 = T5EncoderModel.from_config(T5Config(
        vocab_size=tok.vocab_size, d_model=16, d_kv=8, d_ff=32, num_layers=1,
        num_heads=2))
    proj = AudioLDM2ProjectionModel.from_config(AudioLDM2ProjectionConfig(
        text_encoder_dim=12, text_encoder_1_dim=16, langauge_model_dim=24))
    gpt2 = GPT2Model.from_config(GPT2Config(
        vocab_size=64, n_positions=128, n_embd=24, n_layer=1, n_head=2))
    unet = AudioLDM2UNet.from_config(AudioLDM2UNetConfig(
        in_channels=4, out_channels=4, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=(None, 24, 24),
        attention_head_dim=8, norm_num_groups=8))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        in_channels=1, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4))
    vocoder = HiFiGANVocoder.from_config(HiFiGANConfig(
        model_in_dim=16, upsample_initial_channel=32,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))

    pipe = AudioLDM2Pipeline(
        vae=vae, text_encoder=clap, text_encoder_2=t5, projection_model=proj,
        language_model=gpt2, tokenizer=tok, tokenizer_2=tok, unet=unet,
        scheduler=DDIMScheduler(), vocoder=vocoder)
    audio = pipe("a cat meowing", audio_length_in_s=0.512,
                 num_inference_steps=2, max_new_tokens=4)[0]
    assert audio.ndim == 2 and audio.shape[0] == 1
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0


def test_unidiffuser_modes():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae
    from paddlemix_tpu.diffusers import DPMSolverMultistepScheduler
    from paddlemix_tpu.diffusers.pipelines import (
        UniDiffuserConfig, UniDiffuserModel, UniDiffuserPipeline,
        UniDiffuserTextDecoder)
    from paddlemix_tpu.models.gpt2 import GPT2Config, GPT2Model

    tok = tiny_tokenizer()
    unet = UniDiffuserModel.from_config(UniDiffuserConfig(
        text_dim=16, clip_img_dim=8, num_text_tokens=16,
        num_attention_heads=2, attention_head_dim=8, in_channels=4,
        sample_size=8, patch_size=2, num_layers=3))
    gpt2 = GPT2Model.from_config(GPT2Config(
        vocab_size=tok.vocab_size, n_positions=64, n_embd=16, n_layer=1,
        n_head=2))
    decoder = UniDiffuserTextDecoder(gpt2, prefix_dim=16)
    pipe = UniDiffuserPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok, dim=16),
        image_encoder=None, clip_tokenizer=tok, text_decoder=decoder,
        text_tokenizer=tok, unet=unet,
        scheduler=DPMSolverMultistepScheduler())

    out = pipe("a dog", num_inference_steps=2)
    assert out["images"].shape == (1, 16, 16, 3)
    assert np.isfinite(out["images"]).all()

    pipe.set_joint_mode()
    out = pipe(num_inference_steps=2)
    assert "images" in out and "token_ids" in out
    assert out["token_ids"].shape[0] == 1


def test_ip_adapter_loading_and_inference(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    import numpy as onp
    from safetensors.numpy import save_file
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae
    from paddlemix_tpu.diffusers import DDIMScheduler, StableDiffusionPipeline

    tok = tiny_tokenizer()
    pipe = StableDiffusionPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok), tokenizer=tok,
        unet=tiny_unet(), scheduler=DDIMScheduler())

    # synthesize an ip-adapter file matching the tiny unet: 2 cross-attn
    # attn2 modules (one down block, one up block), odd key ids, torch layout
    cross_dim, inner, clip_dim = 32, 16, 24
    rng = onp.random.RandomState(0)
    tensors = {
        "image_proj.proj.weight": rng.randn(4 * cross_dim, clip_dim).astype("float32"),
        "image_proj.proj.bias": onp.zeros(4 * cross_dim, "float32"),
        "image_proj.norm.weight": onp.ones(cross_dim, "float32"),
        "image_proj.norm.bias": onp.zeros(cross_dim, "float32"),
    }
    # tiny unet attn2 order: down_0 (ch16), up_1 x2 (ch16), mid (ch32)
    key_id = 1
    for inner_dim in (16, 16, 16, 32):
        for nm in ("to_k_ip", "to_v_ip"):
            tensors[f"ip_adapter.{key_id}.{nm}.weight"] = \
                rng.randn(inner_dim, cross_dim).astype("float32") * 0.02
        key_id += 2
    f = str(tmp_path / "ip-adapter.safetensors")
    save_file(tensors, f)

    proj = pipe.load_ip_adapter(f)
    assert pipe.unet.config.ip_adapter_tokens == 4
    emb = jnp.asarray(rng.randn(1, clip_dim).astype("float32"))
    img = pipe("a cat", height=32, width=32, num_inference_steps=2,
               output_type="np", ip_adapter_image_embeds=emb)[0]
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img).all()


def test_dance_diffusion_unet1d():
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import UNet1DConfig, UNet1DModel
    from paddlemix_tpu.diffusers.pipelines import DanceDiffusionPipeline

    unet = UNet1DModel.from_config(UNet1DConfig(
        sample_size=256, in_channels=2, out_channels=2,
        block_out_channels=(8, 8, 16)))
    x = jnp.zeros((1, 256, 2))
    out = unet.module.apply({"params": unet.params}, x, jnp.asarray(5.0))
    assert out.shape == x.shape

    pipe = DanceDiffusionPipeline(unet=unet, scheduler=DDPMScheduler())
    audio = pipe(num_inference_steps=2, audio_length_in_s=0.016)[0]
    assert audio.shape[0] == 1 and audio.shape[1] == 2
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0


def _ldm_resnet(prefix, cin, cout, temb=64):
    import numpy as onp
    rng = onp.random.RandomState(hash(prefix) % 2**31)
    d = {
        f"{prefix}.in_layers.0.weight": onp.ones(cin, "float32"),
        f"{prefix}.in_layers.0.bias": onp.zeros(cin, "float32"),
        f"{prefix}.in_layers.2.weight": rng.randn(cout, cin, 3, 3).astype("float32") * .02,
        f"{prefix}.in_layers.2.bias": onp.zeros(cout, "float32"),
        f"{prefix}.emb_layers.1.weight": rng.randn(cout, temb).astype("float32") * .02,
        f"{prefix}.emb_layers.1.bias": onp.zeros(cout, "float32"),
        f"{prefix}.out_layers.0.weight": onp.ones(cout, "float32"),
        f"{prefix}.out_layers.0.bias": onp.zeros(cout, "float32"),
        f"{prefix}.out_layers.3.weight": rng.randn(cout, cout, 3, 3).astype("float32") * .02,
        f"{prefix}.out_layers.3.bias": onp.zeros(cout, "float32"),
    }
    if cin != cout:
        d[f"{prefix}.skip_connection.weight"] = rng.randn(cout, cin, 1, 1).astype("float32") * .02
        d[f"{prefix}.skip_connection.bias"] = onp.zeros(cout, "float32")
    return d


def _ldm_attn(prefix, d, ctx):
    import numpy as onp
    rng = onp.random.RandomState(hash(prefix) % 2**31)
    t = f"{prefix}.transformer_blocks.0"
    out = {
        f"{prefix}.norm.weight": onp.ones(d, "float32"),
        f"{prefix}.norm.bias": onp.zeros(d, "float32"),
        f"{prefix}.proj_in.weight": rng.randn(d, d, 1, 1).astype("float32") * .02,
        f"{prefix}.proj_in.bias": onp.zeros(d, "float32"),
        f"{prefix}.proj_out.weight": rng.randn(d, d, 1, 1).astype("float32") * .02,
        f"{prefix}.proj_out.bias": onp.zeros(d, "float32"),
    }
    for n in ("norm1", "norm2", "norm3"):
        out[f"{t}.{n}.weight"] = onp.ones(d, "float32")
        out[f"{t}.{n}.bias"] = onp.zeros(d, "float32")
    for attn, kdim in (("attn1", d), ("attn2", ctx)):
        out[f"{t}.{attn}.to_q.weight"] = rng.randn(d, d).astype("float32") * .02
        out[f"{t}.{attn}.to_k.weight"] = rng.randn(d, kdim).astype("float32") * .02
        out[f"{t}.{attn}.to_v.weight"] = rng.randn(d, kdim).astype("float32") * .02
        out[f"{t}.{attn}.to_out.0.weight"] = rng.randn(d, d).astype("float32") * .02
        out[f"{t}.{attn}.to_out.0.bias"] = onp.zeros(d, "float32")
    out[f"{t}.ff.net.0.proj.weight"] = rng.randn(8 * d, d).astype("float32") * .02
    out[f"{t}.ff.net.0.proj.bias"] = onp.zeros(8 * d, "float32")
    out[f"{t}.ff.net.2.weight"] = rng.randn(d, 4 * d).astype("float32") * .02
    out[f"{t}.ff.net.2.bias"] = onp.zeros(d, "float32")
    return out


def test_single_file_unet_conversion():
    import numpy as onp
    from paddlemix_tpu.diffusers.single_file import convert_ldm_unet
    from paddlemix_tpu.diffusers.models import (UNet2DConditionConfig,
                                                UNet2DConditionModel)

    ch0, ch1, ctx, temb = 16, 32, 16, 64
    p = "model.diffusion_model."
    sd = {}
    rng = onp.random.RandomState(0)
    sd[p + "time_embed.0.weight"] = rng.randn(temb, ch0).astype("float32") * .02
    sd[p + "time_embed.0.bias"] = onp.zeros(temb, "float32")
    sd[p + "time_embed.2.weight"] = rng.randn(temb, temb).astype("float32") * .02
    sd[p + "time_embed.2.bias"] = onp.zeros(temb, "float32")
    sd[p + "input_blocks.0.0.weight"] = rng.randn(ch0, 4, 3, 3).astype("float32") * .02
    sd[p + "input_blocks.0.0.bias"] = onp.zeros(ch0, "float32")
    # down block 0 (cross-attn): 1 layer + downsample
    sd.update(_ldm_resnet(p + "input_blocks.1.0", ch0, ch0, temb))
    sd.update(_ldm_attn(p + "input_blocks.1.1", ch0, ctx))
    sd[p + "input_blocks.2.0.op.weight"] = rng.randn(ch0, ch0, 3, 3).astype("float32") * .02
    sd[p + "input_blocks.2.0.op.bias"] = onp.zeros(ch0, "float32")
    # down block 1 (plain): 1 layer, no downsample
    sd.update(_ldm_resnet(p + "input_blocks.3.0", ch0, ch1, temb))
    # mid
    sd.update(_ldm_resnet(p + "middle_block.0", ch1, ch1, temb))
    sd.update(_ldm_attn(p + "middle_block.1", ch1, ctx))
    sd.update(_ldm_resnet(p + "middle_block.2", ch1, ch1, temb))
    # up block 0 (plain, 2 layers) + upsample
    sd.update(_ldm_resnet(p + "output_blocks.0.0", ch1 + ch1, ch1, temb))
    sd.update(_ldm_resnet(p + "output_blocks.1.0", ch1 + ch0, ch1, temb))
    sd[p + "output_blocks.1.1.conv.weight"] = rng.randn(ch1, ch1, 3, 3).astype("float32") * .02
    sd[p + "output_blocks.1.1.conv.bias"] = onp.zeros(ch1, "float32")
    # up block 1 (cross-attn, 2 layers, no upsample)
    sd.update(_ldm_resnet(p + "output_blocks.2.0", ch1 + ch0, ch0, temb))
    sd.update(_ldm_attn(p + "output_blocks.2.1", ch0, ctx))
    sd.update(_ldm_resnet(p + "output_blocks.3.0", ch0 + ch0, ch0, temb))
    sd.update(_ldm_attn(p + "output_blocks.3.1", ch0, ctx))
    sd[p + "out.0.weight"] = onp.ones(ch0, "float32")
    sd[p + "out.0.bias"] = onp.zeros(ch0, "float32")
    sd[p + "out.2.weight"] = rng.randn(4, ch0, 3, 3).astype("float32") * .02
    sd[p + "out.2.bias"] = onp.zeros(4, "float32")

    cfg = UNet2DConditionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(ch0, ch1),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=ctx, attention_head_dim=8,
        norm_num_groups=8))
    unet = UNet2DConditionModel.from_state_dict(cfg, convert_ldm_unet(sd, 1))
    # spot-check weight placement (conv OIHW -> HWIO, linear transpose)
    onp.testing.assert_allclose(
        onp.asarray(unet.params["conv_in"]["kernel"]),
        sd[p + "input_blocks.0.0.weight"].transpose(2, 3, 1, 0))
    onp.testing.assert_allclose(
        onp.asarray(unet.params["down_blocks_0"]["attentions_0"]
                    ["transformer_blocks_0"]["attn2"]["to_k"]["kernel"]),
        sd[p + "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"].T)
    out = unet.module.apply({"params": unet.params}, jnp.zeros((1, 8, 8, 4)),
                            jnp.ones((1,)), jnp.zeros((1, 4, ctx)))
    assert out.shape == (1, 8, 8, 4)


def test_musicldm_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_tokenizer, tiny_unet
    from paddlemix_tpu.diffusers import DDIMScheduler
    from paddlemix_tpu.diffusers.models import AutoencoderKL, AutoencoderKLConfig
    from paddlemix_tpu.diffusers.pipelines import MusicLDMPipeline
    from paddlemix_tpu.models.audioldm import HiFiGANConfig, HiFiGANVocoder
    from paddlemix_tpu.models.audioldm2 import ClapTextConfig, ClapTextModelWithProjection

    tok = tiny_tokenizer()
    clap = ClapTextModelWithProjection.from_config(ClapTextConfig(
        vocab_size=tok.vocab_size, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=64,
        projection_dim=32))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        in_channels=1, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4))
    vocoder = HiFiGANVocoder.from_config(HiFiGANConfig(
        model_in_dim=16, upsample_initial_channel=32,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
    pipe = MusicLDMPipeline(vae=vae, text_encoder=clap, tokenizer=tok,
                            unet=tiny_unet(), scheduler=DDIMScheduler(),
                            vocoder=vocoder)
    audio = pipe("upbeat jazz", audio_length_in_s=0.032, num_inference_steps=2)[0]
    assert audio.ndim == 2 and np.isfinite(audio).all()


def test_yolo_world():
    from paddlemix_tpu.models.yolo_world import (YOLOWorldConfig, YOLOWorldModel,
                                                 simple_nms)

    cfg = YOLOWorldConfig(base_channels=8, depth_mult=0.34, width_mult=1.0,
                          text_channels=16, embed_dims=16,
                          neck_embed_channels=(8, 16, 16),
                          neck_num_heads=(1, 2, 2), num_csp_blocks=1, reg_max=4)
    m = YOLOWorldModel.from_config(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    txt = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16))
    logits, boxes = m.module.apply({"params": m.params}, img, txt)
    n = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert logits.shape == (1, n, 3)
    assert boxes.shape == (1, n, 4)
    assert np.isfinite(np.asarray(boxes)).all()

    # NMS: two identical boxes -> one survives
    b = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                    jnp.float32)
    s = jnp.asarray([0.9, 0.8, 0.7])
    order, keep = simple_nms(b, s, top_k=3)
    assert int(keep.sum()) == 2
    assert bool(keep[0]) and not bool(keep[1])


def test_pixart_alpha_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_tokenizer, tiny_vae
    from paddlemix_tpu.diffusers import DPMSolverMultistepScheduler
    from paddlemix_tpu.diffusers.models import PixArtConfig, PixArtTransformer2DModel
    from paddlemix_tpu.diffusers.pipelines import PixArtAlphaPipeline
    from paddlemix_tpu.models.t5 import T5Config, T5EncoderModel

    tok = tiny_tokenizer()
    t5 = T5EncoderModel.from_config(T5Config(
        vocab_size=tok.vocab_size, d_model=16, d_kv=8, d_ff=32, num_layers=1,
        num_heads=2))
    tf = PixArtTransformer2DModel.from_config(PixArtConfig(
        sample_size=8, patch_size=2, in_channels=4, out_channels=8,
        num_layers=2, num_attention_heads=2, attention_head_dim=8,
        caption_channels=16))
    pipe = PixArtAlphaPipeline(tokenizer=tok, text_encoder=t5, vae=tiny_vae(),
                               transformer=tf,
                               scheduler=DPMSolverMultistepScheduler())
    img = pipe("a red square", num_inference_steps=2, output_type="np")[0]
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()


def test_shap_e_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.pipelines import (
        ShapEPipeline, ShapEPrior, ShapEPriorConfig, ShapERenderer,
        ShapERendererConfig)

    tok = tiny_tokenizer()
    prior = ShapEPrior.from_config(ShapEPriorConfig(
        num_latent_tokens=32, d_latent=16, num_attention_heads=2,
        attention_head_dim=8, num_layers=1, clip_embed_dim=16))
    renderer = ShapERenderer.from_config(ShapERendererConfig(
        d_latent=16, d_hidden=8, n_hidden_layers=6, n_projected_layers=4))
    pipe = ShapEPipeline(prior=prior,
                         text_encoder=tiny_text_encoder(tok, dim=16),
                         tokenizer=tok, scheduler=DDPMScheduler(clip_sample=False),
                         shap_e_renderer=renderer)
    views = pipe("a chair", num_inference_steps=2, frame_size=16, n_views=2)[0]
    assert views.shape == (1, 2, 16, 16, 3)
    assert np.isfinite(views).all()


def test_kandinsky3_pipeline():
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_tokenizer
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import (Kandinsky3UNet,
                                                Kandinsky3UNetConfig, VQModel,
                                                VQModelConfig)
    from paddlemix_tpu.diffusers.pipelines import Kandinsky3Pipeline
    from paddlemix_tpu.models.t5 import T5Config, T5EncoderModel

    tok = tiny_tokenizer()
    t5 = T5EncoderModel.from_config(T5Config(
        vocab_size=tok.vocab_size, d_model=16, d_kv=8, d_ff=32, num_layers=1,
        num_heads=2))
    unet = Kandinsky3UNet.from_config(Kandinsky3UNetConfig(
        in_channels=4, time_embedding_dim=32, groups=4, attention_head_dim=8,
        layers_per_block=1, block_out_channels=(16, 32),
        cross_attention_dim=16, encoder_hid_dim=16,
        add_cross_attention=(False, True), add_self_attention=(False, True)))
    movq = VQModel.from_config(VQModelConfig(
        block_out_channels=(8, 16), down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4, num_vq_embeddings=32))
    pipe = Kandinsky3Pipeline(tokenizer=tok, text_encoder=t5, unet=unet,
                              scheduler=DDPMScheduler(clip_sample=False), movq=movq)
    img = pipe("a red cat", height=32, width=32, num_inference_steps=2,
               output_type="np")[0]
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img).all()


def test_visualglm_v1_prefix_lm():
    """ChatGLM-v1 mode (reference VisualGLM's legacy GLM): prefix tokens
    attend bidirectionally — a LATER prefix token changes an EARLIER
    position's logits, impossible under the causal v2 mode."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from paddlemix_tpu.models.visualglm.modeling import ChatGLMConfig, ChatGLMModule

    cfg = ChatGLMConfig(vocab_size=64, hidden_size=32, ffn_hidden_size=64,
                        num_layers=2, num_attention_heads=4,
                        multi_query_group_num=2, glm_version=1)
    module = ChatGLMModule(cfg)
    ids = jnp.asarray([[1, 5, 9, 11, 3, 7]], jnp.int32)
    params = module.init(jax.random.PRNGKey(0), ids)["params"]
    prefix = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)

    out1 = module.apply({"params": params}, ids, prefix_mask=prefix)
    ids2 = ids.at[0, 3].set(20)  # change the LAST prefix token
    out2 = module.apply({"params": params}, ids2, prefix_mask=prefix)
    # position 0 sees the change (bidirectional prefix)
    assert float(jnp.abs(out1[0, 0] - out2[0, 0]).max()) > 1e-6

    # v2 causal: same edit is invisible at position 0
    cfg2 = dataclasses.replace(cfg, glm_version=2)
    module2 = ChatGLMModule(cfg2)
    o1 = module2.apply({"params": params}, ids)
    o2 = module2.apply({"params": params}, ids2)
    np.testing.assert_allclose(np.asarray(o1[0, 0]), np.asarray(o2[0, 0]),
                               atol=1e-6)
