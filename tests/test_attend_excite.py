"""Attend-and-Excite: functional cross-attention capture + excite updates.

Reference ppdiffusers pipeline_stable_diffusion_attend_and_excite.py swaps
attention processors to record maps; here CrossAttention sows probabilities
whenever "intermediates" is mutable (models/attention.py), and the whole
refine+denoise loop is one compiled program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers.models import (
    AutoencoderKL,
    AutoencoderKLConfig,
    UNet2DConditionConfig,
    UNet2DConditionModel,
)
from paddlemix_tpu.diffusers.schedulers import DDIMScheduler
from paddlemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel, CLIPTokenizer
from paddlemix_tpu.models.clip.tokenizer import bytes_to_unicode


def _tokenizer(max_len=16):
    vocab = {}
    for s in bytes_to_unicode().values():
        vocab[s] = len(vocab)
        vocab[s + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return CLIPTokenizer(vocab, [], model_max_length=max_len)


@pytest.fixture(scope="module")
def pipe():
    from paddlemix_tpu.diffusers.pipelines import (
        StableDiffusionAttendAndExcitePipeline,
    )

    tok = _tokenizer()
    cfg = CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        eos_token_id=tok.eos_token_id, projection_dim=32)
    text = CLIPTextModel.from_config(cfg, seed=0)
    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        block_out_channels=(8, 16), down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4))
    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32, attention_head_dim=2,
        norm_num_groups=8)))
    return StableDiffusionAttendAndExcitePipeline(
        vae=vae, text_encoder=text, tokenizer=tok, unet=unet,
        scheduler=DDIMScheduler())


def test_cross_attn_capture_is_normalized(pipe):
    """mutable=["intermediates"] must yield head-averaged probability maps."""
    unet = pipe.unet
    lat = jnp.zeros((1, 8, 8, 4), unet.dtype)
    ctx = jnp.zeros((1, 16, 32), unet.dtype)
    out, inter = unet.module.apply(
        {"params": unet.params}, lat, jnp.asarray(5), ctx,
        mutable=["intermediates"])
    maps = [l for l in jax.tree_util.tree_leaves(inter["intermediates"])
            if hasattr(l, "ndim") and l.ndim == 3]
    assert maps, "no cross-attention maps sown"
    for m in maps:
        assert m.shape[0] == 1 and m.shape[2] == 16
        np.testing.assert_allclose(np.asarray(m.sum(-1)),
                                   np.ones(m.shape[:2]), atol=1e-3)
    # the capture path must not change the forward output
    out_plain = unet.module.apply({"params": unet.params}, lat,
                                  jnp.asarray(5), ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_plain), atol=1e-4)


def test_attend_excite_end_to_end(pipe):
    img, = pipe("a cat and a frog", token_indices=(1, 3), height=32, width=32,
                num_inference_steps=3, max_iter_to_alter=2, attn_res=8,
                output_type="np", seed=0)
    assert img.shape == (1, 32, 32, 3) and np.isfinite(img).all()


def test_excite_updates_change_latents(pipe):
    kw = dict(token_indices=(1,), height=32, width=32, num_inference_steps=2,
              attn_res=8, output_type="latent", seed=0)
    plain, = pipe("a cat", max_iter_to_alter=0, **kw)
    excited, = pipe("a cat", max_iter_to_alter=2, **kw)
    assert float(jnp.abs(plain - excited).max()) > 1e-5
