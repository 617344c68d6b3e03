"""Spectrogram diffusion tests (reference pipelines/spectrogram_diffusion +
t5_film_transformer.py)."""

import numpy as np
import jax.numpy as jnp

from paddlemix_tpu.diffusers.pipelines.spectrogram_diffusion import (
    SpectrogramEncoderConfig,
    SpectrogramNotesEncoder,
    T5FilmDecoder,
    T5FilmDecoderConfig,
)

ENC = dict(max_length=32, vocab_size=64, d_model=32, num_layers=2,
           num_heads=2, d_kv=16, d_ff=64)


def test_encoders_and_film_decoder():
    notes = SpectrogramNotesEncoder.from_config(
        SpectrogramEncoderConfig.from_dict(ENC), seed=0)
    out = notes(jnp.asarray([[3, 5, 7, 0]], jnp.int32),
                jnp.asarray([[1, 1, 1, 0]], jnp.int32))
    assert out.shape == (1, 4, 32)

    cont = SpectrogramNotesEncoder.from_config(
        SpectrogramEncoderConfig.from_dict(dict(ENC, input_dims=8)), seed=0)
    out_c = cont(jnp.ones((1, 6, 8)))
    assert out_c.shape == (1, 6, 32)

    dec = T5FilmDecoder.from_config(T5FilmDecoderConfig(
        input_dims=8, targets_length=6, d_model=32, num_layers=2, num_heads=2,
        d_kv=16, d_ff=64), seed=0)
    encoded = jnp.concatenate([out, out_c], axis=1)
    mask = jnp.ones((1, 10), jnp.int32)
    mel = dec.module.apply({"params": dec.params}, encoded, mask,
                           jnp.zeros((1, 6, 8)), jnp.asarray([0.5]))
    assert mel.shape == (1, 6, 8)
    assert bool(jnp.all(jnp.isfinite(mel)))
    # FiLM conditioning is live: different noise time changes the output
    mel2 = dec.module.apply({"params": dec.params}, encoded, mask,
                            jnp.zeros((1, 6, 8)), jnp.asarray([0.9]))
    assert float(jnp.abs(mel - mel2).max()) > 1e-6


def test_spectrogram_pipeline_e2e():
    from paddlemix_tpu.diffusers.pipelines import SpectrogramDiffusionPipeline
    from paddlemix_tpu.diffusers.schedulers import DDPMScheduler

    notes = SpectrogramNotesEncoder.from_config(
        SpectrogramEncoderConfig.from_dict(ENC), seed=0)
    cont = SpectrogramNotesEncoder.from_config(
        SpectrogramEncoderConfig.from_dict(dict(ENC, input_dims=8)), seed=0)
    dec = T5FilmDecoder.from_config(T5FilmDecoderConfig(
        input_dims=8, targets_length=6, d_model=32, num_layers=2, num_heads=2,
        d_kv=16, d_ff=64), seed=0)
    pipe = SpectrogramDiffusionPipeline(
        notes_encoder=notes, continuous_encoder=cont, decoder=dec,
        scheduler=DDPMScheduler(num_train_timesteps=20,
                                beta_schedule="squaredcos_cap_v2",
                                clip_sample=False))
    mel, = pipe([np.asarray([3, 5, 7, 9]), np.asarray([2, 4, 6, 8])],
                num_inference_steps=3)
    assert mel.shape == (12, 8)  # 2 segments x 6 frames
    assert np.isfinite(mel).all()
