"""CLIP family tests: tiny-config forwards, HF checkpoint parity, tokenizer,
contrastive loss (incl. multi-device all_gather), zero-shot metric."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.clip import (
    CLIPConfig,
    CLIPModel,
    CLIPTextModel,
    CLIPTokenizer,
    clip_contrastive_loss,
)
from paddlemix_tpu.metrics.clip_zero_shot import build_zero_shot_classifier, zero_shot_accuracy
from paddlemix_tpu.processors.clip_processing import CLIPImageProcessor

TINY = dict(
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=2, image_size=32, patch_size=16),
    text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=2,
                     max_position_embeddings=16, eos_token_id=98),
    projection_dim=16,
)


def tiny_model():
    return CLIPModel.from_config(CLIPConfig.from_dict(TINY), seed=0)


def test_clip_forward_shapes():
    model = tiny_model()
    px = jnp.ones((2, 32, 32, 3))
    ids = jnp.full((2, 8), 5, jnp.int32).at[:, -1].set(98)
    img, txt, scale = model(px, ids)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(img, axis=-1)), 1.0, rtol=1e-5)


def test_clip_save_load(tmp_path):
    model = tiny_model()
    model.save_pretrained(str(tmp_path))
    model2 = CLIPModel.from_pretrained(str(tmp_path))
    px = jnp.ones((1, 32, 32, 3))
    ids = jnp.full((1, 8), 5, jnp.int32).at[:, -1].set(98)
    a = model(px, ids)[0]
    b = model2(px, ids)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_hf_clip_parity(tmp_path):
    """Load a torch-saved HF CLIP checkpoint and match its outputs."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16, eos_token_id=98,
            bos_token_id=97, pad_token_id=96,
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
        ),
        projection_dim=16,
    )
    hf = transformers.CLIPModel(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    model = CLIPModel.from_pretrained(str(tmp_path))
    rng = np.random.RandomState(0)
    px = rng.randn(2, 3, 32, 32).astype(np.float32)
    ids = np.array([[97, 5, 7, 98] + [96] * 4, [97, 9, 11, 13, 98, 96, 96, 96]], dtype=np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px))
        hf_img = out.image_embeds.numpy()
        hf_txt = out.text_embeds.numpy()

    img, txt, _ = model(jnp.asarray(np.transpose(px, (0, 2, 3, 1))), jnp.asarray(ids.astype(np.int32)))
    hf_img = hf_img / np.linalg.norm(hf_img, axis=-1, keepdims=True)
    hf_txt = hf_txt / np.linalg.norm(hf_txt, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(img), hf_img, atol=1e-4)
    np.testing.assert_allclose(np.asarray(txt), hf_txt, atol=1e-4)


def test_hf_clip_text_model_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=16, eos_token_id=98,
        bos_token_id=97, pad_token_id=96,
    )
    hf = transformers.CLIPTextModel(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    model = CLIPTextModel.from_pretrained(str(tmp_path))
    ids = np.array([[97, 3, 5, 98, 96, 96]], dtype=np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    seq, _ = model(jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(seq), hf_out, atol=1e-4)


def test_contrastive_loss_single_and_multidevice(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    feats_i = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    feats_t = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    feats_i = feats_i / jnp.linalg.norm(feats_i, axis=-1, keepdims=True)
    feats_t = feats_t / jnp.linalg.norm(feats_t, axis=-1, keepdims=True)
    ref = clip_contrastive_loss(feats_i, feats_t, 10.0)

    # shard batch over all mesh axes and compute the same loss with all_gather
    from jax import shard_map

    spec = P(("data", "fsdp", "tensor"))
    f = shard_map(
        lambda a, b: clip_contrastive_loss(a, b, 10.0, axis_name=("data", "fsdp", "tensor"))[None],
        mesh=mesh8, in_specs=(spec, spec), out_specs=spec,
    )
    dist = jnp.mean(f(feats_i, feats_t))
    np.testing.assert_allclose(float(dist), float(ref), rtol=1e-5)


def test_tokenizer_roundtrip():
    # byte-level vocab covering ascii + a couple of merges
    byte_syms = list(dict.fromkeys(
        [c for b, c in __import__("paddlemix_tpu.models.clip.tokenizer", fromlist=["bytes_to_unicode"]).bytes_to_unicode().items()]
    ))
    vocab = {}
    for s in byte_syms:
        vocab[s] = len(vocab)
        vocab[s + "</w>"] = len(vocab)
    for extra in ["ca", "cat</w>", "<|startoftext|>", "<|endoftext|>"]:
        vocab[extra] = len(vocab)
    merges = [("c", "a"), ("ca", "t</w>")]
    tok = CLIPTokenizer(vocab, merges, model_max_length=16)
    out = tok(["a cat", "the cat sat"])
    assert out["input_ids"].shape == (2, 16)
    assert out["input_ids"][0, 0] == tok.bos_token_id
    decoded = tok.decode(out["input_ids"][0])
    assert "cat" in decoded
    # truncation keeps eos
    out2 = tok("a cat " * 50, max_length=8)
    assert out2["input_ids"][0, -1] == tok.eos_token_id


def test_image_processor():
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    proc = CLIPImageProcessor(size=32, crop_size=32)
    out = proc([img, img])
    assert out["pixel_values"].shape == (2, 32, 32, 3)
    assert abs(float(out["pixel_values"].mean())) < 3.0


def test_zero_shot_metric():
    model = tiny_model()
    vocab_tok = lambda texts: {"input_ids": np.full((len(texts), 8), 5, np.int32)}
    classifier = build_zero_shot_classifier(
        lambda ids: model.encode_text(ids), vocab_tok, ["cat", "dog"], templates=("a {}.",))
    feats = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    acc = zero_shot_accuracy(feats, classifier, jnp.zeros(4, jnp.int32))
    assert 0.0 <= acc["top1"] <= 1.0 and acc["top5"] == 1.0


def test_coca():
    from paddlemix_tpu.models.clip.coca import CoCaConfig, CoCaModel, coca_loss

    cfg = CoCaConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=16, patch_size=8),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         max_position_embeddings=16, eos_token_id=63),
        projection_dim=16, num_img_queries=7, multimodal_layers=2))
    model = CoCaModel.from_config(cfg, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    ids = jnp.full((2, 8), 5, jnp.int32).at[:, -1].set(63)
    img, txt, caption_logits, scale = model(px, ids)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    assert caption_logits.shape == (2, 8, 64)
    labels = jnp.asarray(np.where(np.asarray(ids) == 63, -100, np.asarray(ids)))
    loss = coca_loss(img, txt, caption_logits, labels, scale)
    assert np.isfinite(float(loss)) and float(loss) > 0
