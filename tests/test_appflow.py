"""Appflow tests (reference tests/appflow/test_*.py pattern, tiny components)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from paddlemix_tpu.appflow import APPLICATIONS, Appflow


def test_registry_contents():
    for app in ("text2image_generation", "image2text_generation",
                "zero_shot_classification"):
        assert app in APPLICATIONS


def test_unknown_app_raises():
    with pytest.raises(ValueError):
        Appflow(app="nope")


def test_text2image_app_with_prebuilt_pipeline():
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae
    from paddlemix_tpu.diffusers import DDIMScheduler, StableDiffusionPipeline

    tok = tiny_tokenizer()
    pipe = StableDiffusionPipeline(vae=tiny_vae(), text_encoder=tiny_text_encoder(tok),
                                   tokenizer=tok, unet=tiny_unet(), scheduler=DDIMScheduler())
    app = Appflow(app="text2image_generation", models=[pipe])
    out = app(prompt="a cat", height=32, width=32, num_inference_steps=2)
    assert len(out["result"]) == 1


def test_zero_shot_classification_app():
    from test_clip import tiny_model
    from paddlemix_tpu.processors.clip_processing import CLIPImageProcessor, CLIPProcessor
    from test_pipelines import tiny_tokenizer

    clip = tiny_model()
    tok = tiny_tokenizer(max_len=16)
    # rebuild the clip text tower sized for this tokenizer
    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel

    cfg = CLIPConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=32, patch_size=16),
        text_config=dict(vocab_size=tok.vocab_size, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         max_position_embeddings=16, eos_token_id=tok.eos_token_id),
        projection_dim=16))
    clip = CLIPModel.from_config(cfg)
    proc = CLIPProcessor(image_processor=CLIPImageProcessor(size=32, crop_size=32),
                         tokenizer=tok)
    app = Appflow(app="zero_shot_classification", models=[(clip, proc)])
    img = (np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8)
    out = app(image=img, candidate_labels=["cat", "dog"])
    assert len(out["result"]) == 2
    assert out["result"][0]["score"] >= out["result"][1]["score"]


def test_image2text_vlm_bundle(tmp_path):
    """Full Appflow image2text path: tiny LLaVA + image processor + real
    tokenizers-lib tokenizer -> decoded string answer."""
    import json as _json

    import jax.numpy as jnp
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer

    from paddlemix_tpu.appflow.helpers import VLMBundle
    from paddlemix_tpu.models.llava import LlavaConfig, LlavaForConditionalGeneration
    from paddlemix_tpu.processors.clip_processing import CLIPImageProcessor
    from paddlemix_tpu.utils.tokenizer import HFTokenizer

    tok = Tokenizer(BPE(unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.train_from_iterator(["user what is in the picture assistant a cat"] * 10,
                            BpeTrainer(special_tokens=["<unk>", "</s>"], vocab_size=60))
    vocab_size = tok.get_vocab_size()
    hf_tok = HFTokenizer(tok, eos_token_id=tok.token_to_id("</s>"), model_max_length=64)

    model = LlavaForConditionalGeneration.from_config(LlavaConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=16, patch_size=8),
        text_config=dict(vocab_size=vocab_size + 2, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=128,
                         eos_token_id=tok.token_to_id("</s>")),
        image_token_index=vocab_size + 1)))
    bundle = VLMBundle(model, CLIPImageProcessor(size=16, crop_size=16), hf_tok,
                       max_new_tokens=4)
    img = (np.random.RandomState(0).rand(20, 20, 3) * 255).astype(np.uint8)
    answer = bundle.answer(image=img, prompt="what is in the picture")
    assert isinstance(answer, str)

    from paddlemix_tpu.appflow import Appflow

    app = Appflow(app="image2text_generation", models=[bundle])
    out = app(image=img, prompt="describe")
    assert isinstance(out["result"], str)


def test_openset_det_sam_chain():
    """GroundingDINO -> SAM chained app (reference openset_det_sam)."""
    import jax

    from paddlemix_tpu.models.groundingdino import GroundingDinoConfig, GroundingDinoModel
    from paddlemix_tpu.models.sam import SamConfig, SamModel

    det = GroundingDinoModel.from_config(GroundingDinoConfig(
        swin_config=dict(patch_size=4, embed_dim=16, depths=(1, 1, 1),
                         num_heads=(2, 2, 2), window_size=4, out_indices=(0, 1, 2)),
        text_vocab_size=64, text_hidden_size=32, text_layers=1, text_heads=2,
        max_text_len=16, hidden_size=32, num_heads=2, num_feature_levels=3,
        num_encoder_layers=1, num_decoder_layers=1, num_queries=4, num_points=2,
        ffn_dim=64))
    sam = SamModel.from_config(SamConfig(
        image_size=64, patch_size=8, encoder_embed_dim=32, encoder_depth=1,
        encoder_num_heads=2, encoder_global_attn_indexes=(0,), window_size=4,
        out_chans=16, prompt_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        decoder_mlp_dim=32))
    app = Appflow(app="openset_det_sam", models=[(det, sam)])
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    out = app(image=img, input_ids=np.asarray([[2, 5, 9]]), box_threshold=0.0)
    res = out["result"]
    assert res["boxes"].shape[1] == 4
    if len(res["boxes"]):
        assert res["masks"].shape[0] == len(res["boxes"])


def test_appflow_new_tasks_registered():
    from paddlemix_tpu.appflow.appflow import APPLICATIONS

    for task in ("text2video_generation", "image2image_generation",
                 "inpainting", "music_generation", "automatic_label"):
        assert task in APPLICATIONS


def test_appflow_inpainting_runs():
    import sys
    sys.path.insert(0, "tests")
    import numpy as np
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae
    from paddlemix_tpu.appflow import Appflow
    from paddlemix_tpu.diffusers import DDIMScheduler
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionInpaintPipeline
    from test_pipelines import tiny_unet

    tok = tiny_tokenizer()
    pipe = StableDiffusionInpaintPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok), tokenizer=tok,
        unet=tiny_unet(), scheduler=DDIMScheduler())
    app = Appflow(app="inpainting", models=[pipe])
    img = np.zeros((32, 32, 3), np.float32)
    mask = np.ones((32, 32), np.float32)
    out = app(prompt="a cat", image=img, mask=mask, num_inference_steps=2,
              seed=0)
    assert "result" in out


def test_round2_tasks_registered():
    from paddlemix_tpu.appflow.appflow import APPLICATIONS

    for app in ("image_variation", "instruct_edit", "image_super_resolution",
                "video2video_generation", "audio_generation"):
        assert app in APPLICATIONS, app


def test_instruct_edit_app():
    import numpy as np

    from paddlemix_tpu.appflow import Appflow
    from paddlemix_tpu.diffusers.pipelines import (
        StableDiffusionInstructPix2PixPipeline,
    )
    from paddlemix_tpu.diffusers.schedulers import DDIMScheduler
    from test_extra_pipelines import (
        COND_UNET,
        TINY_VAE,
        _tiny_text_encoder,
        _tiny_tokenizer,
        _unet,
    )
    from paddlemix_tpu.diffusers.models import AutoencoderKL, AutoencoderKLConfig

    tok = _tiny_tokenizer()
    pipe = StableDiffusionInstructPix2PixPipeline(
        vae=AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE)),
        text_encoder=_tiny_text_encoder(tok), tokenizer=tok,
        unet=_unet(dict(COND_UNET, in_channels=8)),
        scheduler=DDIMScheduler(num_train_timesteps=100))
    app = Appflow(app="instruct_edit", models=[pipe])
    out = app(prompt="make it snow", image=np.zeros((32, 32, 3), np.float32),
              num_inference_steps=2)
    assert np.isfinite(np.asarray(out["result"])).all()


def test_clip_interrogator_app(tmp_path):
    """clip_interrogate builds a prompt = caption + ranked bank terms, and
    data_path term banks override the built-ins."""
    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel
    from paddlemix_tpu.processors.clip_processing import (
        CLIPImageProcessor,
        CLIPProcessor,
    )
    from test_pipelines import tiny_tokenizer

    tok = tiny_tokenizer(max_len=16)
    cfg = CLIPConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=32, patch_size=16),
        text_config=dict(vocab_size=tok.vocab_size, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2, max_position_embeddings=16,
                         eos_token_id=tok.eos_token_id),
        projection_dim=16))
    clip = CLIPModel.from_config(cfg)
    proc = CLIPProcessor(image_processor=CLIPImageProcessor(size=32, crop_size=32),
                         tokenizer=tok)
    img = (np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8)

    app = Appflow(app="clip_interrogate", models=[(clip, proc)],
                  caption_fn=lambda image: "a test image.")
    fast = app(image=img, mode="fast", max_flavors=2)["result"]
    assert fast.startswith("a test image")
    assert len(fast.split(", ")) == 3  # caption + 2 flavors

    classic = app(image=img, mode="classic")["result"]
    assert classic.startswith("a test image, ")

    # custom banks via data_path (uneven sizes exercise chunk padding)
    for name, terms in [("mediums", ["medium-x"]), ("artists", ["artist-y"]),
                        ("movements", ["movement-z"]), ("trends", ["trend-w"]),
                        ("flavors", ["flavor-a", "flavor-b", "flavor-c"])]:
        (tmp_path / f"{name}.txt").write_text("\n".join(terms))
    app2 = Appflow(app="clip_interrogate", models=[(clip, proc)],
                   data_path=str(tmp_path))
    out = app2(image=img, mode="classic", max_flavors=1)["result"]
    assert "medium-x artist-y" in out and "trend-w" in out
    assert "movement-z" in out and "flavor-" in out
