"""InternVL2 chat + EVA-02 tests (tiny configs, tiling end-to-end, MIM loss)."""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.models.eva02 import EVA02Config, EVA02Model, mim_loss
from paddlemix_tpu.models.internvl2 import InternVLChatConfig, InternVLChatModel
from paddlemix_tpu.processors import InternVLImageProcessor


def test_internvl_chat_with_tiling():
    cfg = InternVLChatConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32, patch_size=8),
        llm_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, max_position_embeddings=128),
        img_context_token_id=120,
        downsample_ratio=0.5,
    ))
    model = InternVLChatModel.from_config(cfg, seed=0)
    assert cfg.tokens_per_tile == 4  # (32/8/2)^2

    proc = InternVLImageProcessor(image_size=32, max_num=4, pad_to_tiles=5)
    img = (np.random.RandomState(0).rand(64, 128, 3) * 255).astype(np.uint8)
    enc = proc([img])
    tiles = jnp.asarray(enc["pixel_values"][0])  # (T, 32, 32, 3)
    n_tok = tiles.shape[0] * cfg.tokens_per_tile
    ids = np.full((1, n_tok + 4), 5, np.int64)
    ids[:, 1: 1 + n_tok] = 120
    logits, _ = model(jnp.asarray(ids.astype(np.int32)), tiles)
    assert logits.shape == (1, ids.shape[1], 128)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # vision features influence output
    logits2, _ = model(jnp.asarray(ids.astype(np.int32)), tiles + 1.0)
    assert float(jnp.abs(logits - logits2).max()) > 1e-4


def test_eva02_mim_and_classify():
    cfg = EVA02Config(image_size=28, patch_size=14, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=2, teacher_dim=16)
    model = EVA02Model.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    mask = jnp.asarray([[True, False, True, False]] * 2)
    feats = model(px, bool_masked_pos=mask)
    assert feats.shape == (2, 4, 16)
    teacher = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    loss = mim_loss(feats, teacher, mask)
    assert 0.0 < float(loss) < 2.5
    # finetune variant
    clf = EVA02Model.from_config(cfg.replace(num_classes=10), seed=0)
    logits = clf(px)
    assert logits.shape == (2, 10)


def test_qwen_vl_v1():
    from paddlemix_tpu.models.qwen_vl import QwenVLConfig, QwenVLForConditionalGeneration

    cfg = QwenVLConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32, patch_size=8),
        text_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        num_queries=8, image_token_id=120))
    model = QwenVLForConditionalGeneration.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    ids = np.full((1, 8 + 4), 5, np.int32)
    ids[:, 1:9] = 120
    logits, _ = model(jnp.asarray(ids), px)
    assert logits.shape == (1, 12, 128)
    assert bool(jnp.all(jnp.isfinite(logits)))
    logits2, _ = model(jnp.asarray(ids), px + 1.0)
    assert float(jnp.abs(logits - logits2).max()) > 1e-4
