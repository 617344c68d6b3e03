"""Whisper: encoder-decoder speech recognition.

TPU-native ASR model filling the reference's audio-understanding slot: the
reference's Audio2Caption / AudioChat applications run whisper through
paddlespeech executors (reference applications/README.md:90-91,
paddlemix/appflow/audio_asr.py delegates to paddlespeech ASRExecutor). Here
the model is first-class: HF-checkpoint-compatible weights (openai/whisper-*
layout), jitted greedy decode over a static KV cache, cross-attention K/V
computed once per utterance (not per step).

Architecture (matches transformers WhisperForConditionalGeneration):
- encoder: two gelu Conv1d stems (stride 1 then 2) over 80-bin log-mel,
  fixed sinusoidal positions (stored as a weight for checkpoint parity),
  pre-LN transformer; final LN.
- decoder: learned positions, pre-LN blocks with causal self-attn + cross
  attn (k_proj bias-less in both, like BART), logits = embed_tokens^T (tied).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ..llama.modeling import KVCache


@dataclasses.dataclass
class WhisperConfig(BaseConfig):
    model_type = "whisper"
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384                 # whisper-tiny
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5
    decoder_start_token_id: int = 50257
    eos_token_id: int = 50256


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper encoder position table: [sin(t*inv) | cos(t*inv)] with
    inv = exp(-ln(10000)/(C/2-1) * arange(C/2)) (verified numerically against
    transformers WhisperEncoder.embed_positions init)."""
    inv = np.exp(-np.log(10000.0) / (channels // 2 - 1) * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


class WhisperAttention(nn.Module):
    """q/v/out with bias, k without (BART/Whisper convention)."""

    heads: int
    d_model: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.d_model
        self.q_proj = nn.Dense(d, dtype=self.dtype)
        self.k_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.v_proj = nn.Dense(d, dtype=self.dtype)
        self.out_proj = nn.Dense(d, dtype=self.dtype)

    def _split(self, x):
        b, s, d = x.shape
        return x.reshape(b, s, self.heads, d // self.heads)

    def __call__(self, x, kv=None, bias=None):
        """Full attention. kv: source for K/V (cross-attn); None = self."""
        src = x if kv is None else kv
        q = self._split(self.q_proj(x))
        k = self._split(self.k_proj(src))
        v = self._split(self.v_proj(src))
        o = scaled_dot_product_attention(q, k, v, bias=bias)
        return self.out_proj(o.reshape(x.shape))

    def project_kv(self, src):
        """Precompute cross-attn K/V once per utterance: (B, S, H, Dh) x2."""
        return self._split(self.k_proj(src)), self._split(self.v_proj(src))

    def decode_step(self, x, positions, cache_kv):
        """One (or few) token step against a static self-attn KV cache."""
        b, s, d = x.shape
        q = self._split(self.q_proj(x))
        k = self._split(self.k_proj(x))
        v = self._split(self.v_proj(x))
        k_cache, v_cache = cache_kv
        L = k_cache.shape[1]
        write_idx = jnp.where(positions >= 0, jnp.minimum(positions, L - 1), L - 1)
        bidx = jnp.arange(b)[:, None]
        k_cache = k_cache.at[bidx, write_idx].set(k.astype(k_cache.dtype))
        v_cache = v_cache.at[bidx, write_idx].set(v.astype(v_cache.dtype))
        rel = jnp.arange(L - 1)[None, :] - positions[..., None]   # (B,S,L-1)
        causal = jnp.where(rel <= 0, 0.0, -1e9)[:, None, :, :]
        o = scaled_dot_product_attention(
            q, k_cache[:, :L - 1], v_cache[:, :L - 1], bias=causal)
        return self.out_proj(o.reshape(b, s, d)), (k_cache, v_cache)

    def attend_kv(self, x, k, v):
        """Cross-attn against precomputed K/V."""
        q = self._split(self.q_proj(x))
        o = scaled_dot_product_attention(q, k, v)
        return self.out_proj(o.reshape(x.shape))


class WhisperEncoderLayer(nn.Module):
    config: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        x = x + WhisperAttention(cfg.encoder_attention_heads, cfg.d_model,
                                 dtype=self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        h = nn.gelu(nn.Dense(cfg.encoder_ffn_dim, dtype=self.dtype, name="fc1")(h),
                    approximate=False)
        return x + nn.Dense(cfg.d_model, dtype=self.dtype, name="fc2")(h)


class WhisperEncoder(nn.Module):
    config: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        """input_features: (B, T, num_mel_bins) — NWC log-mel frames."""
        cfg = self.config
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), padding=((1, 1),),
                            dtype=self.dtype, name="conv1")(input_features),
                    approximate=False)
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), strides=(2,), padding=((1, 1),),
                            dtype=self.dtype, name="conv2")(x), approximate=False)
        # sinusoidal table stored as a weight — HF checkpoints carry it
        pos = self.param("pos_embed",
                         lambda rng: jnp.asarray(sinusoids(
                             cfg.max_source_positions, cfg.d_model)))
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        for i in range(cfg.encoder_layers):
            x = WhisperEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="layer_norm")(x)


class WhisperDecoderLayer(nn.Module):
    config: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                                 dtype=self.dtype)
        self.self_attn = WhisperAttention(cfg.decoder_attention_heads,
                                          cfg.d_model, dtype=self.dtype)
        self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                                    dtype=self.dtype)
        self.encoder_attn = WhisperAttention(cfg.decoder_attention_heads,
                                             cfg.d_model, dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                             dtype=self.dtype)
        self.fc1 = nn.Dense(self.config.decoder_ffn_dim, dtype=self.dtype)
        self.fc2 = nn.Dense(self.config.d_model, dtype=self.dtype)

    def __call__(self, x, enc, positions=None, cache_kv=None, cross_kv=None):
        h = self.self_attn_layer_norm(x)
        new_cache = None
        if cache_kv is not None:
            attn, new_cache = self.self_attn.decode_step(h, positions, cache_kv)
        else:
            s = x.shape[1]
            causal = jnp.where(
                jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, -1e9)
            attn = self.self_attn(h, bias=causal[None, None])
        x = x + attn
        h = self.encoder_attn_layer_norm(x)
        if cross_kv is not None:
            x = x + self.encoder_attn.attend_kv(h, cross_kv[0], cross_kv[1])
        else:
            x = x + self.encoder_attn(h, kv=enc)
        h = self.final_layer_norm(x)
        h = nn.gelu(self.fc1(h), approximate=False)
        return x + self.fc2(h), new_cache

    def project_cross_kv(self, enc):
        return self.encoder_attn.project_kv(enc)


class WhisperModule(nn.Module):
    config: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = WhisperEncoder(cfg, dtype=self.dtype)
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype)
        self.dec_pos = self.param("dec_pos", nn.initializers.normal(0.02),
                                  (cfg.max_target_positions, cfg.d_model))
        self.dec_layers = [
            WhisperDecoderLayer(cfg, dtype=self.dtype, name=f"dec_layers_{i}")
            for i in range(cfg.decoder_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                         dtype=self.dtype)

    def encode(self, input_features):
        return self.encoder(input_features)

    def cross_kv(self, enc):
        """All layers' cross-attn K/V, computed once per utterance."""
        return [blk.project_cross_kv(enc) for blk in self.dec_layers]

    def decode(self, decoder_input_ids, enc, positions=None, cache=None,
               cross_kv=None):
        x = self.embed_tokens(decoder_input_ids)
        b, s = x.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        x = x + jnp.take(self.dec_pos, jnp.maximum(positions, 0), axis=0).astype(x.dtype)
        new_k, new_v = [], []
        for i, blk in enumerate(self.dec_layers):
            layer_cache = None if cache is None else (cache.k[i], cache.v[i])
            ckv = None if cross_kv is None else (cross_kv[0][i], cross_kv[1][i])
            x, nc = blk(x, enc, positions=positions, cache_kv=layer_cache,
                        cross_kv=ckv)
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        x = self.decoder_norm(x)
        logits = x @ self.embed_tokens.embedding.T.astype(x.dtype)
        out_cache = None
        if cache is not None:
            valid = (positions >= 0).sum(axis=-1).astype(jnp.int32)
            out_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v),
                                cache.lengths + valid)
        return logits, out_cache

    def __call__(self, input_features, decoder_input_ids):
        enc = self.encode(input_features)
        return self.decode(decoder_input_ids, enc)[0]


class WhisperForConditionalGeneration(PretrainedModel):
    config_class = WhisperConfig
    module_class = WhisperModule
    torch_key_map = (
        (r"^model\.encoder\.", r"encoder."),
        (r"^model\.decoder\.embed_tokens\.weight$", r"embed_tokens.embedding"),
        (r"^model\.decoder\.layer_norm\.", r"decoder_norm."),
        (r"^model\.decoder\.layers\.(\d+)\.", r"dec_layers_\1."),
        (r"encoder\.layers\.(\d+)\.", r"encoder.layers_\1."),
        (r"(norm)\.weight$", r"\1.scale"),
        (r"\.weight$", r".kernel"),
    )

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        flat = dict(flat)
        flat.pop("proj_out.weight", None)  # tied to embed_tokens
        out = {}
        # position tables are (N, D) embeddings — route around the generic
        # 2D-transpose (their key lacks the "embedding" marker)
        enc_pos = flat.pop("model.encoder.embed_positions.weight", None)
        dec_pos = flat.pop("model.decoder.embed_positions.weight", None)
        if enc_pos is not None:
            out["encoder.pos_embed"] = np.asarray(enc_pos)
        if dec_pos is not None:
            out["dec_pos"] = np.asarray(dec_pos)
        from ...core.modeling import convert_torch_state_dict

        out.update(convert_torch_state_dict(flat, cls.torch_key_map))
        return out

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 8, config.num_mel_bins)),
                 jnp.zeros((1, 2), jnp.int32)), {})

    def init_cache(self, batch, max_len, dtype=None):
        class _C:
            num_hidden_layers = self.config.decoder_layers
            kv_heads = self.config.decoder_attention_heads
            head_dim_ = self.config.d_model // self.config.decoder_attention_heads

        return KVCache.create(_C, batch, max_len, dtype=dtype or self.dtype)

    def generate(self, input_features, max_new_tokens: int = 64,
                 forced_decoder_ids=(), decoder_start_token_id=None,
                 eos_token_id=None):
        """Greedy transcription. forced_decoder_ids: tokens forced at the
        start (language/task tokens, HF convention), as a flat id tuple."""
        cfg = self.config
        start = (cfg.decoder_start_token_id if decoder_start_token_id is None
                 else decoder_start_token_id)
        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        params = self.params
        module = self.module
        b = input_features.shape[0]
        enc = module.apply({"params": params}, input_features,
                           method=WhisperModule.encode)
        ckv = module.apply({"params": params}, enc,
                           method=WhisperModule.cross_kv)
        cross_k = jnp.stack([k for k, _ in ckv])
        cross_v = jnp.stack([v for _, v in ckv])
        cache = self.init_cache(b, max_new_tokens + len(forced_decoder_ids) + 1)
        forced = jnp.asarray(list(forced_decoder_ids) + [-1], jnp.int32)
        tok = jnp.full((b, 1), start, jnp.int32)
        done = jnp.zeros((b,), bool)

        def step(carry, i):
            tok, cache, done = carry
            pos = cache.lengths[:, None]
            logits, cache = module.apply(
                {"params": params}, tok, enc, positions=pos, cache=cache,
                cross_kv=(cross_k, cross_v), method=WhisperModule.decode)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            # force language/task tokens at the prefix positions
            nxt = jnp.where(i < len(forced_decoder_ids),
                            jnp.broadcast_to(forced[jnp.minimum(
                                i, len(forced_decoder_ids))], nxt.shape), nxt)
            nxt = jnp.where(done, eos, nxt)
            done = done | (nxt == eos)
            return (nxt[:, None], cache, done), nxt

        n = max_new_tokens + len(forced_decoder_ids)
        (_, _, _), toks = jax.lax.scan(step, (tok, cache, done),
                                       jnp.arange(n))
        return toks.T
