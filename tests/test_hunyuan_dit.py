"""HunyuanDiT backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.diffusers.models.hunyuan_dit import (
    HunyuanDiTConfig,
    HunyuanDiTModel,
    get_2d_rotary_pos_embed,
)

CFG = HunyuanDiTConfig(
    sample_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=6,
    num_heads=2, text_states_dim=16, text_states_dim_t5=24, text_len=4,
    text_len_t5=6, learn_sigma=True)


def inputs(b=2, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    return (jax.random.normal(ks[0], (b, 8, 8, 4)),
            jnp.asarray([5.0] * b),
            jax.random.normal(ks[1], (b, 4, 16)),
            jnp.ones((b, 4), jnp.int32),
            jax.random.normal(ks[2], (b, 6, 24)),
            jnp.ones((b, 6), jnp.int32))


def test_forward_shape_learn_sigma():
    model = HunyuanDiTModel.from_config(CFG)
    out = model(*inputs())
    assert out.shape == (2, 8, 8, 8)  # learn_sigma doubles channels
    assert np.isfinite(np.asarray(out)).all()


def test_text_mask_replaces_with_padding_table():
    """Masked-out text positions must use the learned padding row, so two
    different paddings under the same mask give identical outputs."""
    model = HunyuanDiTModel.from_config(CFG)
    x, t, clip, m_clip, t5, m_t5 = inputs(b=1)
    mask = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
    clip2 = clip.at[:, 2:].set(99.0)
    o1 = model(x, t, clip, mask, t5, m_t5)
    o2 = model(x, t, clip2, mask, t5, m_t5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_rope_tables_and_conditioning():
    cos, sin = get_2d_rotary_pos_embed(16, 4, 4)
    assert cos.shape == (16, 8) and sin.shape == (16, 8)
    # base_size remap keeps tables bounded for larger grids
    cos2, _ = get_2d_rotary_pos_embed(16, 8, 8, base_size=4)
    assert cos2.shape == (64, 8)
    model = HunyuanDiTModel.from_config(CFG)
    x, t, clip, m_clip, t5, m_t5 = inputs(b=1)
    o1 = model(x, jnp.asarray([1.0]), clip, m_clip, t5, m_t5)
    o2 = model(x, jnp.asarray([800.0]), clip, m_clip, t5, m_t5)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_jit_and_style_meta_inputs():
    model = HunyuanDiTModel.from_config(CFG)
    x, t, clip, m_clip, t5, m_t5 = inputs(b=1)
    meta = jnp.asarray([[512., 512., 0., 0., 512., 512.]])
    style = jnp.zeros((1,), jnp.int32)
    fn = jax.jit(lambda *a: model.module.apply({"params": model.params}, *a,
                                               image_meta_size=meta,
                                               style=style))
    out = fn(x, t, clip, m_clip, t5, m_t5)
    assert out.shape == (1, 8, 8, 8)


def test_save_load_roundtrip(tmp_path):
    model = HunyuanDiTModel.from_config(CFG)
    model.save_pretrained(str(tmp_path))
    again = HunyuanDiTModel.from_pretrained(str(tmp_path))
    args = inputs(b=1)
    np.testing.assert_allclose(np.asarray(model(*args)),
                               np.asarray(again(*args)), atol=1e-6)


def test_hunyuan_dit_pipeline():
    """Dual-stream t2i sampling end to end (reference hydit sample_t2i)."""
    import sys
    sys.path.insert(0, "tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae

    from paddlemix_tpu.diffusers import DDIMScheduler
    from paddlemix_tpu.diffusers.pipelines import HunyuanDiTPipeline
    from paddlemix_tpu.models.t5 import T5Config, T5EncoderModel

    tok = tiny_tokenizer()
    clip_enc = tiny_text_encoder(tok, dim=16)
    t5 = T5EncoderModel.from_config(T5Config(
        vocab_size=tok.vocab_size, d_model=24, d_kv=8, d_ff=32, num_layers=1,
        num_heads=2))
    tf = HunyuanDiTModel.from_config(CFG)
    pipe = HunyuanDiTPipeline(
        tokenizer=tok, text_encoder=clip_enc, tokenizer_t5=tok,
        text_encoder_t5=t5, vae=tiny_vae(), transformer=tf,
        scheduler=DDIMScheduler())
    img = pipe("a pavilion by the lake", num_inference_steps=2,
               output_type="np")[0]
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()
