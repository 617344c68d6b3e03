"""Deploy layer: export/load round-trip, Predictor AOT serving wrapper."""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.deploy import Predictor, export_fn, load_fn
from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM


def test_export_load_roundtrip(tmp_path):
    model = LlamaForCausalLM.from_config(LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2))
    ids = jnp.ones((1, 4), jnp.int32)

    def fwd(params, ids):
        return model.module.apply({"params": params}, ids)[0]

    ref = fwd(model.params, ids)
    p = str(tmp_path / "llama_fwd.jaxexport")
    export_fn(fwd, (model.params, ids), p)
    loaded = load_fn(p)
    out = loaded(model.params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_predictor(tmp_path):
    model = LlamaForCausalLM.from_config(LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2))
    pred = Predictor(lambda v, ids: model.module.apply(v, ids)[0],
                     {"params": model.params})
    ids = jnp.ones((1, 4), jnp.int32)
    out1 = pred(ids)
    assert out1.shape == (1, 4, 32)
    # second call reuses the compiled executable
    assert len(pred._compiled) == 1
    pred(jnp.ones((1, 4), jnp.int32))
    assert len(pred._compiled) == 1
    # new shape -> new executable
    pred(jnp.ones((2, 8), jnp.int32))
    assert len(pred._compiled) == 2
    cost = pred.cost_analysis(ids)
    assert isinstance(cost, dict)


def test_qwen_vl_export(tmp_path):
    """deploy/qwen_vl/export_model.py exports image-encoder + prefill +
    decode (reference deploy/qwen_vl/export_image_encoder.py +
    run_static_predict.py)."""
    import os
    import subprocess
    import sys

    from paddlemix_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLForConditionalGeneration,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = QwenVLConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=32, patch_size=16),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        num_queries=4, image_token_id=63)
    model = QwenVLForConditionalGeneration.from_config(cfg)
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt)

    out = str(tmp_path / "export")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/qwen_vl/export_model.py"),
         "--model-path", ckpt, "--output", out, "--prompt-len", "8",
         "--max-len", "32"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    for f in ("image_encoder.jaxexport", "prefill.jaxexport",
              "decode.jaxexport"):
        assert os.path.exists(os.path.join(out, f)), f

    from paddlemix_tpu.deploy import load_fn

    enc = load_fn(os.path.join(out, "image_encoder.jaxexport"))
    feats = enc(model.params, jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert feats.shape == (1, 4, 32)  # num_queries x text hidden


def test_llava_export_and_predict(tmp_path):
    """deploy/llava export_model.py + predict.py run a full static-serving
    round trip (reference deploy/llava/run_static_predict.py)."""
    import os
    import subprocess
    import sys

    from paddlemix_tpu.models.llava import (
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=32, patch_size=16),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        image_token_index=63)
    model = LlavaForConditionalGeneration(cfg)
    import jax

    model.params = model.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.num_image_tokens + 2),
                                         jnp.int32),
        pixel_values=jnp.zeros((1, 32, 32, 3)))["params"]
    ckpt = str(tmp_path / "export")
    model.save_pretrained(ckpt)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
               LLAVA_PROMPT_LEN="16", LLAVA_MAX_LEN="32")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/llava/export_model.py"),
         "--model-path", ckpt, "--output", ckpt, "--prompt-len", "16",
         "--max-len", "32"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/llava/predict.py"),
         "--export-dir", ckpt, "--ids", "1,5,9", "--max-new-tokens", "4",
         "--eos", "-1"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tokens:" in r.stdout
    assert len(r.stdout.split("tokens:")[1].strip().strip("[]").split(",")) == 4


def test_qwen2_vl_predict_roundtrip(tmp_path):
    """deploy/qwen2_vl export + static predict loop (M-RoPE decode)."""
    import os
    import subprocess
    import sys

    import jax

    from paddlemix_tpu.models.qwen2_vl import (
        Qwen2VLConfig,
        Qwen2VLForConditionalGeneration,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Qwen2VLConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, depth=1,
                           num_heads=2, patch_size=4, temporal_patch_size=1,
                           spatial_merge_size=2, in_channels=3,
                           embed_dim=32),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=128),
        image_token_id=63)
    model = Qwen2VLForConditionalGeneration.from_config(cfg)
    ckpt = str(tmp_path / "export")
    model.save_pretrained(ckpt)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
               QWEN2VL_PROMPT_LEN="16", QWEN2VL_VISION_PATCHES="16",
               QWEN2VL_MAX_LEN="64")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/qwen2_vl/export_model.py"),
         "--model-path", ckpt, "--output", ckpt, "--prompt-len", "16",
         "--vision-patches", "16", "--max-len", "64"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/qwen2_vl/predict.py"),
         "--export-dir", ckpt, "--ids", "1,5,9", "--max-new-tokens", "4"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tokens:" in r.stdout
