"""SigLIP vision tower: HF torch parity + LLaVA-NeXT-interleave wiring
(reference paddlemix/models/llava/siglip_encoder.py,
examples/llava_next_interleave/)."""

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.models.siglip import SiglipVisionConfig, SiglipVisionModel

TINY = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16)


def test_forward_shapes():
    model = SiglipVisionModel.from_config(SiglipVisionConfig(**TINY))
    seq, pooled = model(jnp.ones((2, 32, 32, 3)))
    assert seq.shape == (2, 4, 32)  # no CLS token
    assert pooled.shape == (2, 32)
    assert np.isfinite(np.asarray(pooled)).all()


def test_hf_torch_parity():
    import torch
    import transformers

    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        attention_dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.SiglipVisionModel(hf_cfg).eval()
    flat = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    model = SiglipVisionModel.from_state_dict(
        SiglipVisionConfig(**TINY), flat, strict=True)

    px = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px.transpose(0, 3, 1, 2)))
    seq, pooled = model(jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(seq),
                               ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_llava_siglip_tower_and_interleave():
    """LLaVA-NeXT-interleave: SigLIP tower + multi-image splice."""
    from paddlemix_tpu.models.llava import (
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    cfg = LlavaConfig(
        vision_tower_type="siglip",
        vision_config=TINY,
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        image_token_index=63)
    model = LlavaForConditionalGeneration(cfg)
    n_tok = cfg.num_image_tokens
    params = model.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n_tok + 2), jnp.int32),
        pixel_values=jnp.zeros((1, 32, 32, 3)))["params"]
    model.params = params
    assert n_tok == 4  # (32/16)^2, no CLS drop for siglip

    # two interleaved images: <img1> text <img2> text
    ids = np.full((1, 2 * n_tok + 6), 5, np.int32)
    ids[:, 1:1 + n_tok] = 63
    ids[:, 1 + n_tok + 2:1 + 2 * n_tok + 2] = 63
    px = np.random.RandomState(0).rand(1, 2, 32, 32, 3).astype(np.float32)

    logits, _ = model.module.apply({"params": params}, jnp.asarray(ids),
                                   pixel_values=jnp.asarray(px))
    assert logits.shape == (1, ids.shape[1], 64)
    assert np.isfinite(np.asarray(logits)).all()

    # the two images must contribute DIFFERENT features at their slots
    feats = model.module.apply({"params": params}, jnp.asarray(px),
                               method=model.module.encode_images)
    assert feats.shape == (1, 2 * n_tok, 32)
    assert not np.allclose(feats[0, :n_tok], feats[0, n_tok:])
