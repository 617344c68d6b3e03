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
