"""BERT/XLM-R encoder tests incl. HF-torch checkpoint parity (the same
contract as the CLIP/Llama parity tests) + Alt-Diffusion e2e."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.bert import (
    BertConfig,
    BertModel,
    RobertaSeriesModelWithTransformation,
    XLMRobertaModel,
)

TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2)


def test_bert_hf_parity(tmp_path):
    import torch
    import transformers

    hf_cfg = transformers.BertConfig(**TINY)
    hf = transformers.BertModel(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=False)

    model = BertModel.from_pretrained(str(tmp_path))
    ids = np.array([[2, 5, 9, 14, 3]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours, pooled = model(jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)
    with torch.no_grad():
        ref_pool = hf(torch.from_numpy(ids)).pooler_output.numpy()
    np.testing.assert_allclose(np.asarray(pooled), ref_pool, atol=2e-3)


def test_xlm_roberta_position_ids():
    cfg = XLMRobertaModel.config_class.from_dict(dict(TINY, pad_token_id=1,
                                                      position_offset=2,
                                                      type_vocab_size=1))
    model = XLMRobertaModel.from_config(cfg, seed=0)
    ids = jnp.asarray([[5, 7, 9, 1, 1]], jnp.int32)  # right-padded
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    out, _ = model(ids, attention_mask=mask)
    assert out.shape == (1, 5, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_roberta_series_projection():
    cfg = RobertaSeriesModelWithTransformation.config_class.from_dict(
        dict(TINY, pad_token_id=1, position_offset=2, type_vocab_size=1,
             project_dim=24))
    model = RobertaSeriesModelWithTransformation.from_config(cfg, seed=0)
    proj, pooled = model(jnp.asarray([[4, 6, 8]], jnp.int32))
    assert proj.shape == (1, 3, 24)


class _FakeMultilingualTokenizer:
    vocab_size = 99
    eos_token_id = 2

    def __call__(self, texts):
        ids = [[3 + (hash(t) + i) % 90 for i in range(8)] for t in texts]
        return {"input_ids": np.asarray(ids, np.int64)}


def test_alt_diffusion_pipeline():
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        AutoencoderKLConfig,
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )
    from paddlemix_tpu.diffusers.pipelines import AltDiffusionPipeline
    from paddlemix_tpu.diffusers.schedulers import DDIMScheduler

    text = RobertaSeriesModelWithTransformation.from_config(
        RobertaSeriesModelWithTransformation.config_class.from_dict(
            dict(TINY, pad_token_id=1, position_offset=2, type_vocab_size=1,
                 project_dim=24)), seed=0)
    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(
        dict(sample_size=16, block_out_channels=(16, 32),
             down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
             up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
             layers_per_block=1, cross_attention_dim=24, attention_head_dim=2,
             norm_num_groups=8)))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8))
    pipe = AltDiffusionPipeline(
        vae=vae, text_encoder=text, tokenizer=_FakeMultilingualTokenizer(),
        unet=unet, scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe("你好世界", height=32, width=32, num_inference_steps=2,
                output_type="np")
    assert np.isfinite(np.asarray(out)).all()
