"""CLI + packaging + layer-decay tests (reference ppdiffusers-cli env /
fp16_safetensors; paddlemix optimization layer-decay groups)."""

import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp


def test_cli_env_runs():
    from paddlemix_tpu.cli import main

    assert main(["env"]) == 0


def test_cli_fp16_safetensors(tmp_path):
    from safetensors.numpy import save_file, load_file

    from paddlemix_tpu.cli import main

    save_file({"w": np.ones((4, 4), np.float32)}, str(tmp_path / "m.safetensors"))
    assert main(["fp16-safetensors", str(tmp_path), "--dtype", "fp16"]) == 0
    out = load_file(str(tmp_path / "m.fp16.safetensors"))
    assert out["w"].dtype == np.float16


def test_pyproject_parses():
    import tomllib

    with open("pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "paddlemix-tpu"
    assert "paddlemix-tpu-cli" in meta["project"]["scripts"]


def test_layer_decay_scales():
    from paddlemix_tpu.optimization import (
        create_optimizer,
        layer_decay_scales,
        layer_id_for_param,
    )

    params = {
        "patch_embed": {"kernel": jnp.ones((2, 2))},
        "blocks_0": {"kernel": jnp.ones((2, 2))},
        "blocks_3": {"kernel": jnp.ones((2, 2))},
        "head": {"kernel": jnp.ones((2, 2))},
    }
    ld = 0.9
    scales = layer_decay_scales(params, ld, num_layers=4)
    # embeddings get the deepest decay; the head gets scale 1.0
    assert scales["patch_embed"]["kernel"] == ld ** 5
    assert scales["blocks_0"]["kernel"] == ld ** 4
    assert scales["blocks_3"]["kernel"] == ld ** 1
    assert scales["head"]["kernel"] == 1.0
    assert layer_id_for_param("blocks.3.attn.q", 6) == 4  # torch naming too

    # the optimizer applies the scales to updates
    tx = create_optimizer(lambda step: 1e-2, layer_decay=ld,
                          params=params, num_layers=4, max_grad_norm=None)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ratio = abs(float(updates["patch_embed"]["kernel"][0, 0])) / \
        abs(float(updates["head"]["kernel"][0, 0]))
    np.testing.assert_allclose(ratio, ld ** 5, rtol=1e-4)


def test_cli_merge_lora(tmp_path):
    """merge-lora folds an adapter into base weights via the CLI
    (reference paddlemix/tools/merge_lora_params.py)."""
    import jax
    import numpy as np

    from paddlemix_tpu.cli import main
    from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from paddlemix_tpu.peft import LoraConfig, lora_init, save_lora

    model = LlamaForCausalLM.from_config(LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2))
    base_dir, lora_dir, out_dir = (str(tmp_path / d)
                                   for d in ("base", "lora", "merged"))
    model.save_pretrained(base_dir)

    cfg = LoraConfig(r=2, target_modules=".*q_proj.*")
    lora = lora_init(model.params, cfg, jax.random.PRNGKey(0))
    # make b nonzero so the merge visibly changes the kernel
    lora = {k: {"a": v["a"], "b": v["b"] + 0.1} for k, v in lora.items()}
    save_lora(lora, cfg, lora_dir)

    rc = main(["merge-lora", base_dir, lora_dir, out_dir, "--model-class",
               "paddlemix_tpu.models.llama.LlamaForCausalLM"])
    assert rc == 0
    merged = LlamaForCausalLM.from_pretrained(out_dir)
    flat0 = dict(jax.tree_util.tree_flatten_with_path(model.params)[0])
    flat1 = dict(jax.tree_util.tree_flatten_with_path(merged.params)[0])
    changed = [k for k in flat0
               if not np.allclose(np.asarray(flat0[k]), np.asarray(flat1[k]))]
    assert changed and all("q_proj" in str(k) for k in changed)


def test_bench_modes_tiny_smoke():
    """The driver-run bench contract must not bitrot: BENCH_TINY=1 runs the
    llava and clip modes end-to-end on CPU and each prints its JSON line."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for mode, metric in (("llava", "llava7b_decode_tokens_per_sec_per_chip"),
                         ("clip", "clip_vitb16_pairs_per_sec_per_chip"),
                         ("", "sdxl_64px_2step_imgs_per_sec_per_chip")):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
                   BENCH_TINY="1", BENCH_NEW_TOKENS="4", BENCH_STEPS="2",
                   BENCH_QUANT="none", BENCH_REPS="1")
        if mode:
            env["BENCH_MODE"] = mode
        r = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                           capture_output=True, text=True, env=env,
                           timeout=420)
        assert r.returncode == 0, (mode, r.stderr[-2000:])
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        parsed = _json.loads(line)
        assert parsed["metric"] == metric
        assert parsed["value"] > 0


def test_cli_convert_pipeline(tmp_path):
    """convert-pipeline: one generic command in place of the reference's 16
    per-family converter scripts (ppdiffusers/scripts/convert_diffusers_model/).
    The torch->flax key-map conversion itself is covered by the
    torch-reference parity suite; this drives the CLI plumbing end to end."""
    from paddlemix_tpu.cli import main
    from paddlemix_tpu.diffusers import DiffusionPipeline
    from tests.test_pipelines import (DDIMScheduler, StableDiffusionPipeline,
                                      tiny_text_encoder, tiny_tokenizer,
                                      tiny_unet, tiny_vae)

    tok = tiny_tokenizer()
    pipe = StableDiffusionPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok), tokenizer=tok,
        unet=tiny_unet(), scheduler=DDIMScheduler())
    src, out = tmp_path / "src", tmp_path / "out"
    pipe.save_pretrained(str(src))

    assert main(["convert-pipeline", str(src), str(out), "--dtype", "fp32"]) == 0
    pipe2 = DiffusionPipeline.from_pretrained(str(out))
    img = pipe2("a cat", height=32, width=32, num_inference_steps=1,
                output_type="np")[0]
    assert img.shape == (1, 32, 32, 3)
