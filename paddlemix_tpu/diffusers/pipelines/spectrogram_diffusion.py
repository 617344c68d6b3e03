"""Spectrogram Diffusion: MIDI-note -> mel-spectrogram generation.

Rebuild of the reference's pipelines/spectrogram_diffusion (notes_encoder.py,
continous_encoder.py, pipeline_spectrogram_diffusion.py) + the FiLM T5
decoder (models/t5_film_transformer.py): two T5-style encoders (note tokens,
previous mel segment) are cross-attended by a FiLM-conditioned T5 decoder
predicting the denoised mel frames; segments generate autoregressively, each
as one jitted DDPM fori_loop.

Differences by design: the reference's ONNX MELGAN vocoder and note_seq MIDI
parsing are external artifacts — the pipeline takes pre-tokenized note
segments and returns mel frames (hook a vocoder via ``melgan=``)."""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


class T5RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps) *
                scale.astype(x.dtype)).astype(x.dtype)


class _T5Attention(nn.Module):
    """T5-style attention: no qk scaling, no out bias."""

    num_heads: int
    d_kv: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, mask=None):
        kv = x if kv is None else kv
        inner = self.num_heads * self.d_kv
        b, sq = x.shape[:2]
        sk = kv.shape[1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(kv)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv)
        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                             -1e9).astype(jnp.float32)
        out = scaled_dot_product_attention(
            q.reshape(b, sq, self.num_heads, self.d_kv),
            k.reshape(b, sk, self.num_heads, self.d_kv),
            v.reshape(b, sk, self.num_heads, self.d_kv),
            bias=bias, scale=1.0)  # T5: scale_qk=False
        return nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                        name="to_out")(out.reshape(b, sq, inner))


class _GatedFF(nn.Module):
    d_ff: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(x)
        u = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(x)
        h = nn.gelu(g, approximate=True) * u
        return nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                        name="wo")(h)


class _Film(nn.Module):
    """x -> x * (1 + scale) + shift from the conditioning embedding
    (reference T5FiLMLayer:421)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        ss = nn.Dense(2 * x.shape[-1], use_bias=False, dtype=self.dtype,
                      name="scale_bias")(cond)
        scale, shift = jnp.split(ss, 2, axis=-1)
        return x * (1 + scale.astype(x.dtype)) + shift.astype(x.dtype)


@dataclasses.dataclass
class SpectrogramEncoderConfig(BaseConfig):
    model_type = "spectrogram_notes_encoder"
    max_length: int = 2048
    vocab_size: int = 1536
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    d_ff: int = 2048
    input_dims: Optional[int] = None  # set -> continuous encoder


class SpectrogramEncoderModule(nn.Module):
    """Notes encoder (token embed) or continuous encoder (mel projection) —
    reference notes_encoder.py / continous_encoder.py."""

    config: SpectrogramEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask=None):
        cfg = self.config
        if cfg.input_dims is None:
            x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                         name="token_embedder")(inputs)
            n = inputs.shape[1]
        else:
            x = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                         name="input_proj")(inputs)
            n = inputs.shape[1]
        pos = self.param("position_encoding", nn.initializers.normal(0.02),
                         (cfg.max_length, cfg.d_model))
        x = x + pos[None, :n].astype(x.dtype)
        for i in range(cfg.num_layers):
            h = T5RMSNorm(dtype=self.dtype, name=f"layers_{i}_norm1")(x)
            x = x + _T5Attention(cfg.num_heads, cfg.d_kv, dtype=self.dtype,
                                 name=f"layers_{i}_attn")(h, mask=mask)
            h = T5RMSNorm(dtype=self.dtype, name=f"layers_{i}_norm2")(x)
            x = x + _GatedFF(cfg.d_ff, dtype=self.dtype,
                             name=f"layers_{i}_ff")(h)
        return T5RMSNorm(dtype=self.dtype, name="final_norm")(x)


class SpectrogramNotesEncoder(PretrainedModel):
    config_class = SpectrogramEncoderConfig
    module_class = SpectrogramEncoderModule

    @classmethod
    def example_inputs(cls, config):
        if config.input_dims is None:
            return (jnp.zeros((1, 8), jnp.int32),), {}
        return (jnp.zeros((1, 8, config.input_dims)),), {}

    def __call__(self, inputs, mask=None):
        return self.module.apply({"params": self.params}, inputs, mask)


SpectrogramContEncoder = SpectrogramNotesEncoder


@dataclasses.dataclass
class T5FilmDecoderConfig(BaseConfig):
    model_type = "t5_film_decoder"
    input_dims: int = 128
    targets_length: int = 256
    max_decoder_noise_time: float = 2000.0
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    d_ff: int = 2048


class T5FilmDecoderModule(nn.Module):
    """FiLM-conditioned T5 decoder (reference t5_film_transformer.py:26):
    timestep -> 4d conditioning; self-attention and FF are FiLM-modulated;
    cross-attention reads the concatenated encoder outputs."""

    config: T5FilmDecoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encoded, enc_mask, decoder_input_tokens,
                 decoder_noise_time):
        cfg = self.config
        b, n, _ = decoder_input_tokens.shape
        # timestep embedding over the scaled noise time
        t = decoder_noise_time * cfg.max_decoder_noise_time
        half = cfg.d_model // 2
        expo = -math.log(cfg.max_decoder_noise_time) * \
            jnp.arange(half, dtype=jnp.float32) / half
        ang = t[:, None].astype(jnp.float32) * jnp.exp(expo)[None]
        t_emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        cond = nn.Dense(cfg.d_model * 4, use_bias=False, dtype=self.dtype,
                        name="conditioning_1")(t_emb.astype(self.dtype))
        cond = nn.Dense(cfg.d_model * 4, use_bias=False, dtype=self.dtype,
                        name="conditioning_2")(nn.silu(cond))
        cond = nn.silu(cond)[:, None, :]  # (B, 1, 4d)

        pos = self.param("position_encoding", nn.initializers.normal(0.02),
                         (cfg.targets_length, cfg.d_model))
        x = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                     name="continuous_inputs_projection")(decoder_input_tokens)
        x = x + pos[None, :n].astype(x.dtype)

        for i in range(cfg.num_layers):
            h = T5RMSNorm(dtype=self.dtype, name=f"layers_{i}_self_norm")(x)
            h = _Film(dtype=self.dtype, name=f"layers_{i}_self_film")(h, cond)
            x = x + _T5Attention(cfg.num_heads, cfg.d_kv, dtype=self.dtype,
                                 name=f"layers_{i}_self_attn")(h)
            h = T5RMSNorm(dtype=self.dtype, name=f"layers_{i}_cross_norm")(x)
            x = x + _T5Attention(cfg.num_heads, cfg.d_kv, dtype=self.dtype,
                                 name=f"layers_{i}_cross_attn")(
                h, kv=encoded, mask=enc_mask)
            h = T5RMSNorm(dtype=self.dtype, name=f"layers_{i}_ff_norm")(x)
            h = _Film(dtype=self.dtype, name=f"layers_{i}_ff_film")(h, cond)
            x = x + _GatedFF(cfg.d_ff, dtype=self.dtype,
                             name=f"layers_{i}_ff")(h)

        x = T5RMSNorm(dtype=self.dtype, name="decoder_norm")(x)
        return nn.Dense(cfg.input_dims, use_bias=False, dtype=self.dtype,
                        name="spec_out")(x)


class T5FilmDecoder(PretrainedModel):
    config_class = T5FilmDecoderConfig
    module_class = T5FilmDecoderModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 8, config.d_model)), jnp.ones((1, 8), jnp.int32),
                jnp.zeros((1, config.targets_length, config.input_dims)),
                jnp.zeros((1,))), {}


@register_pipeline
class SpectrogramDiffusionPipeline(DiffusionPipeline):
    def __init__(self, notes_encoder, continuous_encoder, decoder, scheduler,
                 melgan=None):
        self.register_modules(notes_encoder=notes_encoder,
                              continuous_encoder=continuous_encoder,
                              decoder=decoder, scheduler=scheduler,
                              melgan=melgan)
        self._jit = _JitCache()

    def __call__(self, input_tokens: List, num_inference_steps: int = 100,
                 seed: int = 0, output_type: str = "np"):
        """input_tokens: list of (L,) int note-token segments (the reference's
        midi_utils tokenization output). Returns stacked mel frames
        (segments*targets_length, input_dims), plus melgan audio if wired."""
        cfg = self.decoder.config
        n_target = cfg.targets_length
        d_mel = cfg.input_dims
        key = jax.random.PRNGKey(seed)
        prev_mel = jnp.zeros((1, n_target, d_mel), jnp.float32)
        notes_encoder, cont_encoder = self.notes_encoder, self.continuous_encoder
        decoder, scheduler = self.decoder, self.scheduler
        train_t = scheduler.config.num_train_timesteps

        def build(seg_len):
            def run(n_params, c_params, d_params, tokens, prev_mel, state, key):
                tok_mask = (tokens > 0).astype(jnp.int32)
                notes_enc = notes_encoder.module.apply(
                    {"params": n_params}, tokens, tok_mask)
                cont_mask = jnp.ones(prev_mel.shape[:2], jnp.int32)
                cont_enc = cont_encoder.module.apply(
                    {"params": c_params}, prev_mel, cont_mask)
                encoded = jnp.concatenate([notes_enc, cont_enc], axis=1)
                enc_mask = jnp.concatenate([tok_mask, cont_mask], axis=1)

                key_loop, k0 = jax.random.split(key)
                sample = jax.random.normal(k0, (1, n_target, d_mel), jnp.float32)

                def body(i, carry):
                    sample, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    noise_time = t.astype(jnp.float32) / train_t
                    pred = decoder.module.apply(
                        {"params": d_params}, encoded, enc_mask,
                        sample.astype(decoder.dtype),
                        jnp.broadcast_to(noise_time, (1,))).astype(jnp.float32)
                    sample, state = scheduler.step(state, pred, i, sample,
                                                   key=sub)
                    return sample, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (sample, state, key_loop))
                return out

            return jax.jit(run)

        from .pipeline_utils import make_scheduler_state

        segments = []
        for seg in input_tokens:
            tokens = jnp.asarray(np.asarray(seg), jnp.int32)[None]
            state = make_scheduler_state(self.scheduler, num_inference_steps,
                                         sample_shape=(1, n_target, d_mel))
            key, sub = jax.random.split(key)
            mel = self._jit.get(("specd", tokens.shape, num_inference_steps),
                                lambda: build(tokens.shape[1]))(
                self.notes_encoder.params, self.continuous_encoder.params,
                self.decoder.params, tokens, prev_mel, state, sub)
            segments.append(np.asarray(mel[0]))
            prev_mel = mel
        full = np.concatenate(segments, axis=0)
        if self.melgan is not None:
            return (full, self.melgan(full))
        return (full,)
