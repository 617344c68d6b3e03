"""T5 encoder: HF parity (the SD3 third tower / FlanT5 contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.t5 import T5Config, T5EncoderModel


def test_hf_t5_encoder_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False)
    hf = transformers.T5EncoderModel(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    model = T5EncoderModel.from_pretrained(str(tmp_path))
    ids = np.asarray([[3, 25, 99, 1, 0, 0]], dtype=np.int64)
    mask = np.asarray([[1, 1, 1, 1, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out, _ = model(jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out)[:, :4], hf_out[:, :4], atol=3e-3)


def test_t5_relu_variant(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=1, num_heads=4,
        relative_attention_num_buckets=8, feed_forward_proj="relu",
        tie_word_embeddings=False)
    hf = transformers.T5EncoderModel(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    model = T5EncoderModel.from_pretrained(str(tmp_path))
    ids = np.asarray([[3, 25, 99, 1]], dtype=np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out, _ = model(jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), hf_out, atol=3e-3)


def test_t5_decoder_and_generate():
    import jax.numpy as jnp
    from paddlemix_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    cfg = T5Config(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=2,
                   num_heads=2)
    m = T5ForConditionalGeneration.from_config(cfg)
    logits = m.module.apply({"params": m.params}, jnp.arange(6)[None],
                            jnp.arange(3)[None])
    assert logits.shape == (1, 3, 64)
    out = m.generate(jnp.arange(6)[None], max_new_tokens=4)
    assert out.shape == (1, 4)

    # cached decode must match the full decoder forward
    enc = m.module.apply({"params": m.params}, jnp.arange(6)[None], None,
                         method=type(m.module).encode)
    dec_ids = jnp.asarray([[0, 5, 9]])
    full, _ = m.module.apply({"params": m.params}, dec_ids, enc,
                             method=type(m.module).decode)
    cache = m.init_cache(1, 4)
    outs = []
    for i, t in enumerate([0, 5, 9]):
        lg, cache = m.module.apply({"params": m.params}, jnp.asarray([[t]]), enc,
                                   positions=jnp.asarray([[i]]), cache=cache,
                                   method=type(m.module).decode)
        outs.append(lg[:, 0])
    assert float(jnp.abs(full - jnp.stack(outs, 1)).max()) < 1e-4


def test_blip2_flant5_variant():
    import jax.numpy as jnp
    from paddlemix_tpu.models.blip2 import Blip2Config, Blip2ForConditionalGeneration

    cfg = Blip2Config(
        vision_config=dict(image_size=32, patch_size=8, hidden_size=16,
                           num_hidden_layers=1, num_attention_heads=2,
                           intermediate_size=32),
        qformer_config=dict(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            encoder_hidden_size=16),
        text_config=dict(vocab_size=64, d_model=16, d_kv=8, d_ff=32,
                         num_layers=1, num_heads=2),
        num_query_tokens=4, lm_type="t5")
    m = Blip2ForConditionalGeneration.from_config(cfg)
    logits, _ = m.module.apply({"params": m.params}, jnp.zeros((1, 32, 32, 3)),
                               jnp.arange(5)[None],
                               decoder_input_ids=jnp.zeros((1, 2), jnp.int32))
    assert logits.shape == (1, 2, 64)
