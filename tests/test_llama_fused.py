"""Fused QKV / gate-up projection parity tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.models.llama.modeling import LlamaConfig, LlamaForCausalLM

CFG = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
           num_hidden_layers=2, num_attention_heads=4,
           num_key_value_heads=2, max_position_embeddings=64)


def _fuse_params(params):
    """Transplant separate q/k/v and gate/up kernels into fused layout
    (flax kernels are (in, out): concat along out)."""
    import copy

    fused = copy.deepcopy(params)

    def walk(d):
        for k, v in list(d.items()):
            if isinstance(v, dict):
                if "q_proj" in v:
                    v["qkv_proj"] = {"kernel": jnp.concatenate(
                        [v.pop("q_proj")["kernel"], v.pop("k_proj")["kernel"],
                         v.pop("v_proj")["kernel"]], axis=-1)}
                if "gate_proj" in v:
                    v["gate_up_proj"] = {"kernel": jnp.concatenate(
                        [v.pop("gate_proj")["kernel"],
                         v.pop("up_proj")["kernel"]], axis=-1)}
                walk(v)

    walk(fused)
    return fused


def test_fused_matches_unfused():
    base = LlamaForCausalLM.from_config(LlamaConfig(**CFG))
    fused_model = LlamaForCausalLM.from_config(
        LlamaConfig(**CFG, fused_qkv=True))
    fused_model.params = _fuse_params(base.params)
    ids = jnp.asarray([[3, 5, 7, 11]], jnp.int32)
    ref, _ = base.module.apply({"params": base.params}, ids)
    got, _ = fused_model.module.apply({"params": fused_model.params}, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_checkpoint_conversion(tmp_path):
    """Foreign (torch-layout) q/k/v weights fuse at load when
    config.fused_qkv is set."""
    cfg = LlamaConfig(**CFG)
    rng = np.random.default_rng(0)
    flat = {}
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}.self_attn"
        flat[f"{p}.q_proj.weight"] = rng.normal(
            size=(32, 32)).astype(np.float32)
        flat[f"{p}.k_proj.weight"] = rng.normal(
            size=(16, 32)).astype(np.float32)
        flat[f"{p}.v_proj.weight"] = rng.normal(
            size=(16, 32)).astype(np.float32)
        m = f"model.layers.{i}.mlp"
        flat[f"{m}.gate_proj.weight"] = rng.normal(
            size=(64, 32)).astype(np.float32)
        flat[f"{m}.up_proj.weight"] = rng.normal(
            size=(64, 32)).astype(np.float32)
    fcfg = LlamaConfig(**CFG, fused_qkv=True)
    out = LlamaForCausalLM.convert_foreign_state_dict(flat, fcfg)
    # fused + renamed to flax layout ((in, out) kernels)
    assert "layers_0.self_attn.qkv_proj.kernel" in out
    assert out["layers_0.self_attn.qkv_proj.kernel"].shape == (32, 64)
    assert "layers_1.mlp.gate_up_proj.kernel" in out
    assert not any("q_proj" in k or "gate_proj" in k for k in out)
    # fused kernel must equal the concat of the separate flax kernels
    sep = LlamaForCausalLM.convert_foreign_state_dict(flat, cfg)
    assert "layers_0.self_attn.q_proj.kernel" in sep  # regular conversion
    np.testing.assert_allclose(
        out["layers_0.self_attn.qkv_proj.kernel"],
        np.concatenate([sep["layers_0.self_attn.q_proj.kernel"],
                        sep["layers_0.self_attn.k_proj.kernel"],
                        sep["layers_0.self_attn.v_proj.kernel"]], axis=1))


def test_fused_generate_runs():
    from paddlemix_tpu.models.llama.modeling import greedy_generate

    model = LlamaForCausalLM.from_config(LlamaConfig(**CFG, fused_qkv=True))
    out = greedy_generate(model, jnp.asarray([[3, 5, 7]], jnp.int32),
                          max_new_tokens=4, eos_token_id=-1, bucket=None)
    assert out.shape[1] == 4
