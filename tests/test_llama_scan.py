"""scan_layers Llama: parity with the unrolled stack (same weights) for
full-sequence forward and cached greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.models.llama.modeling import (
    LlamaConfig,
    LlamaForCausalLM,
    greedy_generate,
    stack_layer_params,
)

CFG = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
           num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
           max_position_embeddings=64)


def _flat(params):
    from flax import traverse_util

    return {".".join(p): np.asarray(v)
            for p, v in traverse_util.flatten_dict(params).items()}


def _models():
    base = LlamaForCausalLM.from_config(LlamaConfig(**CFG), seed=0)
    flat = {k + (".weight" if k.endswith("embedding") else ""): v
            for k, v in _flat(base.params).items()}
    # route through the scan stacker directly (kernel names already flax)
    stacked = stack_layer_params(_flat(base.params), CFG["num_hidden_layers"])
    from flax import traverse_util

    scan_params = traverse_util.unflatten_dict(
        {tuple(k.split(".")): jnp.asarray(v) for k, v in stacked.items()})
    scan = LlamaForCausalLM.from_config(LlamaConfig(**CFG, scan_layers=True),
                                        seed=1)
    # shapes must match the scan module's expectations
    ref_shapes = jax.tree_util.tree_map(jnp.shape, scan.params)
    got_shapes = jax.tree_util.tree_map(jnp.shape, scan_params)
    assert ref_shapes == got_shapes, (ref_shapes, got_shapes)
    scan.params = scan_params
    return base, scan


def test_forward_parity():
    base, scan = _models()
    ids = jnp.asarray([[3, 9, 17, 4, 22]], jnp.int32)
    ref = base.module.apply({"params": base.params}, ids)[0]
    out = scan.module.apply({"params": scan.params}, ids)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_cached_generate_parity():
    base, scan = _models()
    ids = jnp.asarray([[3, 9, 17]], jnp.int32)
    ref = greedy_generate(base, ids, max_new_tokens=6, eos_token_id=-1,
                          bucket=None)
    out = greedy_generate(scan, ids, max_new_tokens=6, eos_token_id=-1,
                          bucket=None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_torch_checkpoint_loads_stacked():
    """HF-layout torch dict loads into the scanned layout (strict)."""
    import torch
    import transformers

    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    flat = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    scan = LlamaForCausalLM.from_state_dict(
        LlamaConfig(**CFG, scan_layers=True), dict(flat), strict=True)
    base = LlamaForCausalLM.from_state_dict(
        LlamaConfig(**CFG), dict(flat), strict=True)
    ids = jnp.asarray([[5, 11, 2, 30]], jnp.int32)
    ref = base.module.apply({"params": base.params}, ids)[0]
    out = scan.module.apply({"params": scan.params}, ids)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
