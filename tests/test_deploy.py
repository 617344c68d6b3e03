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
