"""VQ-Diffusion discrete diffusion tests (reference
pipelines/vq_diffusion + scheduling_vq_diffusion.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.diffusers.schedulers import VQDiffusionScheduler


def test_transition_tables_are_distributions():
    sched = VQDiffusionScheduler(num_vec_classes=17, num_train_timesteps=10)
    K = 17
    # per-step transition row sums: a + (K-2)*b + c ... for a non-mask class:
    # stays a, moves to any of K-2 other non-mask with b each, masks with c
    a = np.exp(np.asarray(sched.log_at))
    b = np.exp(np.asarray(sched.log_bt))
    c = np.exp(np.asarray(sched.log_ct))
    np.testing.assert_allclose(a + (K - 1) * b + c, np.ones_like(a), atol=1e-5)
    att = np.exp(np.asarray(sched.log_cumprod_at))
    btt = np.exp(np.asarray(sched.log_cumprod_bt))
    ctt = np.exp(np.asarray(sched.log_cumprod_ct))
    np.testing.assert_allclose(att + (K - 1) * btt + ctt, np.ones_like(att),
                               atol=1e-5)


def test_posterior_is_normalized():
    sched = VQDiffusionScheduler(num_vec_classes=9, num_train_timesteps=10)
    b, n = 2, 6
    x_t = jnp.asarray(np.random.RandomState(0).randint(0, 9, (b, n)), jnp.int32)
    logp_x0 = jax.nn.log_softmax(
        jnp.asarray(np.random.RandomState(1).randn(b, n, 8), jnp.float32), -1)
    post = sched.q_posterior(logp_x0, x_t, jnp.asarray(5))
    total = jnp.exp(jax.scipy.special.logsumexp(post, axis=-1))
    np.testing.assert_allclose(np.asarray(total), np.ones((b, n)), atol=1e-3)


def test_scheduler_unmasks_over_time():
    sched = VQDiffusionScheduler(num_vec_classes=9, num_train_timesteps=8)
    state = sched.set_timesteps(8)
    b, n = 1, 16
    sample = jnp.full((b, n), sched.mask_class, jnp.int32)
    key = jax.random.PRNGKey(0)
    # oracle: x0 is always class 3
    logp = jnp.log(jax.nn.one_hot(jnp.full((b, n), 3), 8) * (1 - 1e-6) + 1e-7)
    for i in range(8):
        key, sub = jax.random.split(key)
        sample, _ = sched.step(state, logp, i, sample, key=sub)
    assert int((sample == 3).sum()) == n  # fully committed to the oracle class
    assert int((sample == sched.mask_class).sum()) == 0


def test_vq_diffusion_pipeline_e2e():
    from paddlemix_tpu.diffusers.models import VQModel, VQModelConfig
    from paddlemix_tpu.diffusers.pipelines import (
        VQDiffusionPipeline,
        VQDiffusionTransformerModel,
    )
    from paddlemix_tpu.diffusers.pipelines.vq_diffusion import (
        VQDiffusionTransformerConfig,
    )
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
    vq = VQModel.from_config(VQModelConfig(
        block_out_channels=(16,), layers_per_block=1, norm_num_groups=8,
        latent_channels=8, num_vq_embeddings=16, vq_embed_dim=8))
    transformer = VQDiffusionTransformerModel.from_config(
        VQDiffusionTransformerConfig(
            num_vec_classes=17, height=8, width=8, num_layers=2,
            num_attention_heads=2, attention_head_dim=8,
            cross_attention_dim=24, num_train_timesteps=10))
    pipe = VQDiffusionPipeline(
        vqvae=vq, text_encoder=text, tokenizer=tok, transformer=transformer,
        scheduler=VQDiffusionScheduler(num_vec_classes=17,
                                       num_train_timesteps=10))
    out, = pipe("a teddy bear", num_inference_steps=4, truncation_rate=0.9)
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(out).all()
