"""LLaVA tests: splice correctness, loss masking, generation, HF parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.llava import LlavaConfig, LlavaForConditionalGeneration, llava_loss

TINY = dict(
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=2, image_size=16, patch_size=8),
    text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
                     max_position_embeddings=64, eos_token_id=2),
    image_token_index=63,
)


@pytest.fixture(scope="module")
def model():
    return LlavaForConditionalGeneration.from_config(LlavaConfig.from_dict(TINY), seed=0)


def make_inputs(cfg, batch=1):
    n_img = cfg.num_image_tokens  # 4 for 16/8
    ids = jnp.full((batch, n_img + 6), 5, jnp.int32)
    ids = ids.at[:, 1: 1 + n_img].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(0), (batch, 16, 16, 3))
    return ids, px


def test_forward_and_splice(model):
    cfg = model.config
    ids, px = make_inputs(cfg)
    logits, _ = model(ids, px)
    assert logits.shape == (1, ids.shape[1], 64)
    # image features actually influence the output
    logits2, _ = model(ids, px + 1.0)
    assert float(jnp.abs(logits - logits2).max()) > 1e-4
    # non-image positions use token embeddings: same ids different pixels only
    # change outputs after the image position (causal)
    np.testing.assert_allclose(np.asarray(logits[:, 0]), np.asarray(logits2[:, 0]), atol=1e-5)


def test_encode_images_shape(model):
    cfg = model.config
    _, px = make_inputs(cfg)
    feats = model.encode_images(px)
    assert feats.shape == (1, cfg.num_image_tokens, 32)


def test_generate_with_image(model):
    cfg = model.config
    ids, px = make_inputs(cfg)
    out = model.generate(ids, px, max_new_tokens=4)
    assert out.shape == (1, 4)
    out2 = model.generate(ids, px, max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_llava_loss_masking():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    labels = jnp.full((2, 8), -100, jnp.int32).at[:, 4:].set(3)
    loss = llava_loss(logits, labels)
    assert float(loss) > 0
    # all-masked -> zero loss, no nan
    loss0 = llava_loss(logits, jnp.full((2, 8), -100, jnp.int32))
    assert float(loss0) == 0.0


def test_hf_llava_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=16, patch_size=8),
        text_config=dict(model_type="llama", vocab_size=64, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, num_key_value_heads=2,
                         max_position_embeddings=64, tie_word_embeddings=False),
        image_token_index=63,
        vision_feature_select_strategy="default",
        vision_feature_layer=-2,
    )
    hf = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    model = LlavaForConditionalGeneration.from_pretrained(str(tmp_path))
    ids = np.full((1, 10), 5, dtype=np.int64)
    ids[:, 1:5] = 63  # 4 image tokens
    px = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids),
                       pixel_values=torch.tensor(px)).logits.numpy()
    logits, _ = model(jnp.asarray(ids.astype(np.int32)),
                      jnp.asarray(np.transpose(px, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=3e-3)
