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
