"""LVDM 3-D stack tests: temporal-compressing VAE round trip, 3-D UNet
forward/grads, uncond + text2video pipelines (reference pipelines/lvdm +
models/lvdm_*)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers.models import (
    LVDMAutoencoderConfig,
    LVDMAutoencoderKL,
    LVDMUNet3DConfig,
    LVDMUNet3DModel,
)

VAE_CFG = LVDMAutoencoderConfig(block_out_channels=(16, 32),
                                temporal_down=(2,), norm_num_groups=8,
                                latent_channels=4)
UNET_CFG = LVDMUNet3DConfig(block_out_channels=(16, 32), layers_per_block=1,
                            num_attention_heads=2, norm_num_groups=8)


@pytest.fixture(scope="module")
def lvdm_vae():
    return LVDMAutoencoderKL.from_config(VAE_CFG, seed=0)


@pytest.fixture(scope="module")
def lvdm_unet():
    return LVDMUNet3DModel.from_config(UNET_CFG, seed=0)


def test_lvdm_vae_compresses_time(lvdm_vae):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    post = lvdm_vae.encode(x)
    # one level with temporal stride 2 and spatial stride 2
    assert post.mean.shape == (1, 2, 8, 8, 4)
    rec = lvdm_vae.decode(post.mode())
    assert rec.shape == (1, 4, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(rec)))


def test_lvdm_unet_forward_and_frames_interact(lvdm_unet):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
    out = jax.jit(lvdm_unet.module.apply)(
        {"params": lvdm_unet.params}, x, jnp.asarray(5))
    assert out.shape == (1, 2, 8, 8, 4)
    x2 = x.at[:, 1].add(1.0)
    out2 = lvdm_unet.module.apply({"params": lvdm_unet.params}, x2,
                                  jnp.asarray(5))
    # temporal conv+attention couple frames
    assert float(jnp.abs(out[:, 0] - out2[:, 0]).max()) > 1e-6


def test_lvdm_pipelines(lvdm_vae, lvdm_unet):
    from paddlemix_tpu.diffusers.pipelines import (
        LVDMTextToVideoPipeline,
        LVDMUncondPipeline,
    )
    from paddlemix_tpu.diffusers.schedulers import DDIMScheduler

    pipe = LVDMUncondPipeline(vae=lvdm_vae, unet=lvdm_unet,
                              scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe(num_frames=4, height=16, width=16, num_inference_steps=2)
    assert out.shape == (1, 4, 16, 16, 3)
    assert np.isfinite(out).all()

    from paddlemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from paddlemix_tpu.models.clip.tokenizer import bytes_to_unicode
    from paddlemix_tpu.models.clip import CLIPTokenizer

    vocab = {}
    for tk in bytes_to_unicode().values():
        vocab[tk] = len(vocab)
        vocab[tk + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    tok = CLIPTokenizer(vocab, [], model_max_length=16)
    text = CLIPTextModel.from_config(CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        eos_token_id=tok.eos_token_id), seed=0)
    unet_c = LVDMUNet3DModel.from_config(
        LVDMUNet3DConfig(block_out_channels=(16, 32), layers_per_block=1,
                         num_attention_heads=2, norm_num_groups=8,
                         cross_attention_dim=24), seed=0)
    pipe = LVDMTextToVideoPipeline(
        vae=lvdm_vae, text_encoder=text, tokenizer=tok, unet=unet_c,
        scheduler=DDIMScheduler(num_train_timesteps=100))
    out, = pipe("a river", num_frames=4, height=16, width=16,
                num_inference_steps=2)
    assert out.shape[0] == 1 and np.isfinite(out).all()


def test_stdit2_forward_and_temporal_coupling():
    """Open-Sora STDiT2 (reference examples/Open-Sora stdit2.py)."""
    from paddlemix_tpu.diffusers.models import STDiT2Config, STDiT2Model

    cfg = STDiT2Config(input_size=(2, 8, 8), hidden_size=32, depth=2,
                       num_heads=2, caption_channels=24, patch_size=2)
    model = STDiT2Model.from_config(cfg, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
    y = jnp.ones((1, 6, 24))
    out = jax.jit(model.module.apply)({"params": model.params}, x,
                                      jnp.asarray(100), y,
                                      fps=jnp.asarray(8.0))
    assert out.shape == (1, 2, 8, 8, 8)  # learned sigma doubles channels
    assert bool(jnp.all(jnp.isfinite(out)))
    # temporal attention couples frames
    x2 = x.at[:, 1].add(1.0)
    out2 = model.module.apply({"params": model.params}, x2, jnp.asarray(100),
                              y, fps=jnp.asarray(8.0))
    assert float(jnp.abs(out[:, 0] - out2[:, 0]).max()) > 1e-6
    # text conditioning is live
    out3 = model.module.apply({"params": model.params}, x, jnp.asarray(100),
                              y * 0.0, fps=jnp.asarray(8.0))
    assert float(jnp.abs(out - out3).max()) > 1e-6
