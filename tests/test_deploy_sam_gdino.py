"""SAM / GroundingDINO deploy export+predict round-trips on tiny configs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_sam_ckpt(path):
    from paddlemix_tpu.models.sam import SamConfig, SamModel

    cfg = SamConfig(image_size=64, patch_size=8, encoder_embed_dim=32,
                    encoder_depth=2, encoder_num_heads=2,
                    encoder_global_attn_indexes=(1,), window_size=4,
                    out_chans=32, prompt_embed_dim=32, decoder_depth=1,
                    decoder_num_heads=2, decoder_mlp_dim=64)
    model = SamModel.from_config(cfg)
    model.save_pretrained(path)
    return path


def test_sam_export_and_predict(tmp_path):
    ckpt = _tiny_sam_ckpt(str(tmp_path / "ckpt"))
    out = str(tmp_path / "export")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "deploy/sam/export_model.py"),
         "--model-path", ckpt, "--input-type", "points", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "sam_points.jaxexport"))

    from PIL import Image

    img = tmp_path / "img.png"
    Image.fromarray(np.random.randint(0, 255, (48, 64, 3), np.uint8)).save(img)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "deploy/sam/predict.py"),
         "--export-dir", out, "--image", str(img), "--input-type", "points",
         "--points", "10,20", "--output", str(tmp_path / "masks.npy")],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    masks = np.load(tmp_path / "masks.npy")
    assert masks.shape[-2:] == (48, 64) and masks.dtype == bool


def test_gdino_export_and_predict(tmp_path):
    from paddlemix_tpu.models.groundingdino import (
        GroundingDinoConfig,
        GroundingDinoModel,
    )

    cfg = GroundingDinoConfig(
        hidden_size=32, num_queries=4, num_encoder_layers=1,
        num_decoder_layers=1, num_heads=2, text_vocab_size=64,
        text_hidden_size=32, text_layers=1, text_heads=2, ffn_dim=64,
        num_feature_levels=2,
        swin_config={"embed_dim": 16, "depths": [1, 1], "num_heads": [1, 2],
                     "window_size": 4})
    model = GroundingDinoModel.from_config(cfg)
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt)
    # minimal vocab.txt so load_tokenizer picks WordPiece
    with open(os.path.join(ckpt, "vocab.txt"), "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "a",
                           "cat", "dog"]))

    out = str(tmp_path / "export")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "deploy/groundingdino/export_model.py"),
         "--model-path", ckpt, "--output", out, "--image-size", "64",
         "--text-len", "8"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    from PIL import Image

    img = tmp_path / "img.png"
    Image.fromarray(np.random.randint(0, 255, (48, 64, 3), np.uint8)).save(img)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "deploy/groundingdino/predict.py"),
         "--export-dir", out, "--image", str(img), "--prompt", "a cat",
         "--image-size", "64", "--text-len", "8", "--box-threshold", "0.0"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "box" in r.stdout
