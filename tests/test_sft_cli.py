"""End-to-end SFT CLI test: JSON config -> AutoModel -> MixToken -> Trainer ->
saved artifacts (mirrors the reference supervised_finetune flow)."""

import json

import numpy as np

from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from paddlemix_tpu.tools.supervised_finetune import freeze_params, main


def _setup(tmp_path):
    model = LlamaForCausalLM.from_config(LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, max_position_embeddings=64))
    model.save_pretrained(str(tmp_path / "model"))
    rng = np.random.RandomState(0)
    with open(tmp_path / "data.jsonl", "w") as f:
        for _ in range(32):
            ids = rng.randint(1, 64, rng.randint(4, 12)).tolist()
            f.write(json.dumps({"input_ids": ids, "labels": ids}) + "\n")
    cfg = dict(model_name_or_path=str(tmp_path / "model"),
               dataset_path=str(tmp_path / "data.jsonl"),
               max_length=32, per_device_train_batch_size=2, learning_rate=1e-3,
               max_steps=3, logging_steps=1, save_steps=0, bf16=False,
               output_dir=str(tmp_path / "out"), warmup_steps=1,
               data_parallel_degree=1)
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return p, cfg


def test_sft_full(tmp_path):
    p, cfg = _setup(tmp_path)
    result = main(str(p))
    assert result["final_step"] == 3
    assert (tmp_path / "out" / "final" / "model.safetensors").exists()


def test_sft_lora(tmp_path):
    p, cfg = _setup(tmp_path)
    result = main(str(p), overrides={"lora": True, "lora_r": 2,
                                     "output_dir": str(tmp_path / "out2")})
    assert result["final_step"] == 3
    assert (tmp_path / "out2" / "lora" / "adapter_model.safetensors").exists()


def test_freeze_params():
    model = LlamaForCausalLM.from_config(LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2))
    mask = freeze_params(model.params, include=r"embed_tokens")
    from flax import traverse_util

    flat = traverse_util.flatten_dict(mask)
    assert not flat[("embed_tokens", "embedding")]
    assert flat[("layers_0", "mlp", "gate_proj", "kernel")]


def test_tipc_benchmark_runner(tmp_path, capsys):
    import json as _json
    import sys as _sys

    p, cfg = _setup(tmp_path)
    from paddlemix_tpu.tools import run_benchmark

    argv = _sys.argv
    _sys.argv = ["run_benchmark", str(p), "--max_steps", "6", "--skip_steps", "2",
                 "--output", str(tmp_path / "bench.json")]
    try:
        run_benchmark.main()
    finally:
        _sys.argv = argv
    result = _json.loads((tmp_path / "bench.json").read_text())
    assert result["speed_unit"] == "sample/sec"
    assert result["steps_measured"] >= 1
    assert result["ips_mean"] > 0
