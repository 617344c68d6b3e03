"""T5 encoder (SD3's third text tower; FlanT5 for BLIP-2).

Rebuild of the reference's T5 port (ppdiffusers/ppdiffusers/transformers/t5/
modeling.py, 1901 LoC — encoder side): relative position bias buckets,
T5LayerNorm (rms, no bias), gated-gelu or relu MLP, no biases anywhere.
HF t5/flan-t5 torch checkpoints load via the key map."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import rms_norm, scaled_dot_product_attention
from ...ops.attention import attention_xla


@dataclasses.dataclass
class T5Config(BaseConfig):
    model_type = "t5"
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu_new"
    is_gated_act: bool = True
    feed_forward_proj: str = "gated-gelu"

    def __post_init__(self):
        # HF encodes activation in feed_forward_proj
        if self.feed_forward_proj.startswith("gated-"):
            self.is_gated_act = True
            self.dense_act_fn = {"gated-gelu": "gelu_new", "gated-silu": "silu"}[
                self.feed_forward_proj]
        elif self.feed_forward_proj == "relu":
            self.is_gated_act = False
            self.dense_act_fn = "relu"


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket function (encoder)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return rms_norm(x, scale.astype(jnp.float32), self.eps).astype(self.dtype)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        cfg = self.config
        b, s, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)

        if position_bias is None and self.has_relative_bias:
            pos = jnp.arange(s)
            rel = pos[None, :] - pos[:, None]
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
            bias_table = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                                  dtype=self.dtype, name="relative_attention_bias")
            position_bias = bias_table(buckets).transpose(2, 0, 1)[None]  # (1,H,S,S)
        if position_bias is None:
            position_bias = jnp.zeros((1, cfg.num_heads, s, s), jnp.float32)
        bias = position_bias
        if mask is not None:
            bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        # T5 does NOT scale by 1/sqrt(d)
        out = scaled_dot_product_attention(q, k, v, bias=bias, scale=1.0)
        out = out.reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        cfg = self.config
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="attn_norm")(x)
        attn, position_bias = T5Attention(cfg, self.has_relative_bias, dtype=self.dtype,
                                          name="attention")(h, position_bias, mask)
        x = x + attn
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="mlp_norm")(x)
        from ...ops import get_activation

        act = get_activation(cfg.dense_act_fn)
        if cfg.is_gated_act:
            wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
            wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
            h = act(wi0) * wi1
        else:
            h = act(nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h))
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x, position_bias


class T5EncoderModule(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                                       name=f"block_{i}")(x, position_bias, attention_mask)
        x = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="final_layer_norm")(x)
        return x, x.mean(axis=1)


_T5_KEY_MAP = (
    (r"^encoder\.embed_tokens\.weight$", r"shared.embedding"),
    (r"^shared\.weight$", r"shared.embedding"),
    (r"^encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.", r"block_\1.attention."),
    (r"^encoder\.block\.(\d+)\.layer\.0\.layer_norm\.", r"block_\1.attn_norm."),
    (r"^encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.", r"block_\1."),
    (r"^encoder\.block\.(\d+)\.layer\.1\.layer_norm\.", r"block_\1.mlp_norm."),
    (r"^encoder\.final_layer_norm\.", r"final_layer_norm."),
    (r"relative_attention_bias\.weight$", r"relative_attention_bias.embedding"),
    (r"(_norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class T5EncoderModel(PretrainedModel):
    config_class = T5Config
    module_class = T5EncoderModule
    torch_key_map = _T5_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 4), jnp.int32),), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        from ...core.modeling import convert_torch_state_dict

        flat = {k: v for k, v in flat.items()
                if not k.startswith(("decoder.", "lm_head."))}
        return convert_torch_state_dict(flat, cls.torch_key_map)


# ============================================================== decoder side
def relative_position_bucket_causal(relative_position, num_buckets=32,
                                    max_distance=128):
    """Unidirectional bucket function (decoder self-attention)."""
    ret = jnp.zeros_like(relative_position)
    n = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5CrossAttention(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, enc_mask=None):
        cfg = self.config
        b, s, _ = x.shape
        se = enc.shape[1]
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(enc)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(enc)
        bias = jnp.zeros((1, cfg.num_heads, s, se), jnp.float32)
        if enc_mask is not None:
            bias = bias + jnp.where(enc_mask[:, None, None, :], 0.0, -1e9)
        out = scaled_dot_product_attention(
            q.reshape(b, s, cfg.num_heads, cfg.d_kv),
            k.reshape(b, se, cfg.num_heads, cfg.d_kv),
            v.reshape(b, se, cfg.num_heads, cfg.d_kv), bias=bias, scale=1.0)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                        name="o")(out.reshape(b, s, inner))


class T5DecoderSelfAttention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, cache_kv=None):
        cfg = self.config
        b, s, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)

        bias_table = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                              dtype=jnp.float32, name="relative_attention_bias") \
            if self.has_relative_bias else None

        new_cache = None
        if cache_kv is not None:
            k_cache, v_cache = cache_kv
            L = k_cache.shape[1]
            write_idx = jnp.where(positions >= 0, jnp.minimum(positions, L - 1), L - 1)
            bidx = jnp.arange(b)[:, None]
            k_cache = k_cache.at[bidx, write_idx].set(k.astype(k_cache.dtype))
            v_cache = v_cache.at[bidx, write_idx].set(v.astype(v_cache.dtype))
            new_cache = (k_cache, v_cache)
            key_pos = jnp.arange(L - 1)
            rel = key_pos[None, :] - positions[..., None]  # (B,S,L-1)
            causal = jnp.where(rel <= 0, 0.0, -1e9)
            if bias_table is not None:
                buckets = relative_position_bucket_causal(
                    rel, cfg.relative_attention_num_buckets,
                    cfg.relative_attention_max_distance)
                pb = bias_table(buckets).transpose(0, 3, 1, 2)  # (B,H,S,L-1)
            else:
                pb = 0.0
            bias = (pb + causal[:, None, :, :]).astype(jnp.float32)
            out = attention_xla(q, k_cache[:, :L - 1], v_cache[:, :L - 1],
                                bias=bias, scale=1.0)
        else:
            pos = jnp.arange(s)
            rel = pos[None, :] - pos[:, None]
            if bias_table is not None:
                buckets = relative_position_bucket_causal(
                    rel, cfg.relative_attention_num_buckets,
                    cfg.relative_attention_max_distance)
                pb = bias_table(buckets).transpose(2, 0, 1)[None]
            else:
                pb = jnp.zeros((1, cfg.num_heads, s, s), jnp.float32)
            bias = pb + jnp.where(rel[None, None] <= 0, 0.0, -1e9)
            out = scaled_dot_product_attention(q, k, v, bias=bias, scale=1.0)
        out = out.reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                        name="o")(out), new_cache


class T5DecoderBlock(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, positions, enc_mask=None, cache_kv=None):
        cfg = self.config
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="attn_norm")(x)
        attn, new_cache = T5DecoderSelfAttention(
            cfg, self.has_relative_bias, dtype=self.dtype, name="attention")(
            h, positions, cache_kv)
        x = x + attn
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                        name="cross_norm")(x)
        x = x + T5CrossAttention(cfg, dtype=self.dtype, name="cross_attention")(
            h, enc, enc_mask)
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="mlp_norm")(x)
        from ...ops import get_activation

        act = get_activation(cfg.dense_act_fn)
        if cfg.is_gated_act:
            wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
            wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
            h = act(wi0) * wi1
        else:
            h = act(nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h))
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x, new_cache


class T5ForConditionalGenerationModule(nn.Module):
    """Full encoder-decoder with tied embeddings and (optionally) a separate
    lm_head (T5 v1.1/flan unties it; tie_word_embeddings=False)."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype)
        self.encoder_blocks = [
            T5Block(cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                    name=f"block_{i}") for i in range(cfg.num_layers)]
        self.encoder_norm = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype)
        self.decoder_blocks = [
            T5DecoderBlock(cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                           name=f"dec_block_{i}") for i in range(cfg.num_layers)]
        self.decoder_norm = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype)
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype)

    def encode(self, input_ids, attention_mask=None, inputs_embeds=None):
        x = self.shared(input_ids) if inputs_embeds is None else inputs_embeds
        position_bias = None
        for blk in self.encoder_blocks:
            x, position_bias = blk(x, position_bias, attention_mask)
        return self.encoder_norm(x)

    def decode(self, decoder_input_ids, encoder_hidden_states, positions=None,
               encoder_attention_mask=None, cache=None):
        x = self.shared(decoder_input_ids)
        b, s = x.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        new_k, new_v = [], []
        for i, blk in enumerate(self.decoder_blocks):
            layer_cache = None if cache is None else (cache.k[i], cache.v[i])
            x, nc = blk(x, encoder_hidden_states, positions,
                        enc_mask=encoder_attention_mask, cache_kv=layer_cache)
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        x = self.decoder_norm(x)
        out_cache = None
        if cache is not None:
            from ..llama.modeling import KVCache

            valid = (positions >= 0).sum(axis=-1).astype(jnp.int32)
            out_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v),
                                cache.lengths + valid)
        # T5 scales tied logits by d_model**-0.5; untied lm_head does not
        logits = self.lm_head(x)
        return logits, out_cache

    def __call__(self, input_ids, decoder_input_ids, attention_mask=None):
        enc = self.encode(input_ids, attention_mask)
        return self.decode(decoder_input_ids, enc,
                           encoder_attention_mask=attention_mask)[0]


_T5_FULL_KEY_MAP = _T5_KEY_MAP[:2] + (
    (r"^decoder\.embed_tokens\.weight$", r"shared.embedding"),
    (r"^encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.", r"block_\1.attention."),
    (r"^encoder\.block\.(\d+)\.layer\.0\.layer_norm\.", r"block_\1.attn_norm."),
    (r"^encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.", r"block_\1."),
    (r"^encoder\.block\.(\d+)\.layer\.1\.layer_norm\.", r"block_\1.mlp_norm."),
    (r"^encoder\.final_layer_norm\.", r"encoder_norm."),
    (r"^decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.", r"dec_block_\1.attention."),
    (r"^decoder\.block\.(\d+)\.layer\.0\.layer_norm\.", r"dec_block_\1.attn_norm."),
    (r"^decoder\.block\.(\d+)\.layer\.1\.EncDecAttention\.", r"dec_block_\1.cross_attention."),
    (r"^decoder\.block\.(\d+)\.layer\.1\.layer_norm\.", r"dec_block_\1.cross_norm."),
    (r"^decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.", r"dec_block_\1."),
    (r"^decoder\.block\.(\d+)\.layer\.2\.layer_norm\.", r"dec_block_\1.mlp_norm."),
    (r"^decoder\.final_layer_norm\.", r"decoder_norm."),
    (r"^lm_head\.weight$", r"lm_head.kernel"),
    (r"relative_attention_bias\.weight$", r"relative_attention_bias.embedding"),
    (r"(_norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class T5ForConditionalGeneration(PretrainedModel):
    config_class = T5Config
    module_class = T5ForConditionalGenerationModule
    torch_key_map = _T5_FULL_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 2), jnp.int32)), {})

    def init_cache(self, batch, max_len, dtype=None):
        from ..llama.modeling import KVCache

        class _C:  # KVCache.create reads these attribute names
            num_hidden_layers = self.config.num_layers
            kv_heads = self.config.num_heads
            head_dim_ = self.config.d_kv

        return KVCache.create(_C, batch, max_len, dtype=dtype or self.dtype)

    def generate(self, input_ids, attention_mask=None, max_new_tokens: int = 32,
                 decoder_start_token_id: int = 0, eos_token_id: int = 1):
        """Greedy encoder-decoder generation with a static KV cache."""
        params = self.params
        module = self.module
        b = input_ids.shape[0]
        enc = module.apply({"params": params}, input_ids, attention_mask,
                           method=self.module_class.encode)
        cache = self.init_cache(b, max_new_tokens + 1)
        tok = jnp.full((b, 1), decoder_start_token_id, jnp.int32)
        done = jnp.zeros((b,), bool)

        def step(carry, _):
            tok, cache, done = carry
            pos = cache.lengths[:, None]
            logits, cache = module.apply(
                {"params": params}, tok, enc, positions=pos,
                encoder_attention_mask=attention_mask, cache=cache,
                method=self.module_class.decode)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, eos_token_id, nxt)
            done = done | (nxt == eos_token_id)
            return (nxt[:, None], cache, done), nxt

        (_, _, _), toks = jax.lax.scan(step, (tok, cache, done), None,
                                       length=max_new_tokens)
        return toks.T
