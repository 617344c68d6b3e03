"""BLIP-2 + OPT tests: forward, generation, HF parity for OPT and full BLIP-2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.blip2 import Blip2Config, Blip2ForConditionalGeneration
from paddlemix_tpu.models.opt import OPTConfig, OPTForCausalLM

TINY_OPT = OPTConfig(vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                     num_attention_heads=2, max_position_embeddings=64)

TINY_BLIP2 = dict(
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=2, image_size=16, patch_size=8),
    qformer_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, cross_attention_frequency=2,
                        encoder_hidden_size=32),
    text_config=dict(vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                     num_attention_heads=2, max_position_embeddings=64),
    num_query_tokens=4,
)


def test_opt_forward_and_hf_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.OPTConfig(
        vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=True)
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    model = OPTForCausalLM.from_pretrained(str(tmp_path))
    ids = np.asarray([[2, 5, 9, 11]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()
    logits, _ = model(jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=5e-3)


def test_blip2_forward_and_generate():
    model = Blip2ForConditionalGeneration.from_config(Blip2Config.from_dict(TINY_BLIP2))
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    ids = jnp.asarray([[2, 5, 9]], jnp.int32)
    logits, _ = model(px, ids)
    assert logits.shape == (1, 4 + 3, 96)  # queries + text
    feats = model.encode_image(px)
    assert feats.shape == (1, 4, 32)
    out = model.generate(px, ids, max_new_tokens=4)
    assert out.shape == (1, 4)


def test_hf_blip2_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=16, patch_size=8),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64, cross_attention_frequency=2,
                            encoder_hidden_size=32, vocab_size=30),
        text_config=dict(model_type="opt", vocab_size=96, hidden_size=32, ffn_dim=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=64, word_embed_proj_dim=32),
        num_query_tokens=4,
    )
    hf = transformers.Blip2ForConditionalGeneration(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    model = Blip2ForConditionalGeneration.from_pretrained(str(tmp_path))
    px = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        image_embeds = hf.vision_model(torch.tensor(px)).last_hidden_state
        queries = hf.query_tokens.expand(1, -1, -1)
        q_out = hf.qformer(query_embeds=queries,
                           encoder_hidden_states=image_embeds).last_hidden_state
        hf_feats = hf.language_projection(q_out).numpy()
    feats = model.encode_image(jnp.asarray(np.transpose(px, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(feats), hf_feats, atol=5e-3)
