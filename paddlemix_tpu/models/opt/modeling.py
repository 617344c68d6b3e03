"""OPT decoder (BLIP-2's frozen LLM; replaces the reference's PaddleNLP OPT
backbone used by blip2/modeling.py). Same cache/generation design as llama."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ...ops.attention import SegmentIds, attention_xla
from ..llama.modeling import KVCache


@dataclasses.dataclass
class OPTConfig(BaseConfig):
    model_type = "opt"
    vocab_size: int = 50272
    hidden_size: int = 2560
    ffn_dim: int = 10240
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None
    do_layer_norm_before: bool = True
    activation_function: str = "relu"
    bos_token_id: int = 2
    eos_token_id: int = 2
    pad_token_id: int = 1

    @property
    def kv_heads(self):
        return self.num_attention_heads

    @property
    def head_dim_(self):
        return self.hidden_size // self.num_attention_heads


class OPTAttention(nn.Module):
    config: OPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, *, segment_ids=None, cache_kv=None):
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim_
        nh = cfg.num_attention_heads
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x).reshape(b, s, nh, hd)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x).reshape(b, s, nh, hd)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x).reshape(b, s, nh, hd)
        new_cache = None
        if cache_kv is not None:
            k_cache, v_cache = cache_kv
            L = k_cache.shape[1]
            write_idx = jnp.where(positions >= 0, jnp.minimum(positions, L - 1), L - 1)
            bidx = jnp.arange(b)[:, None]
            k_cache = k_cache.at[bidx, write_idx].set(k.astype(k_cache.dtype))
            v_cache = v_cache.at[bidx, write_idx].set(v.astype(v_cache.dtype))
            new_cache = (k_cache, v_cache)
            key_pos = jnp.arange(L - 1)[None, None, None, :]
            q_pos = positions[:, None, :, None]
            bias = jnp.where(key_pos <= q_pos, 0.0, -1e9).astype(jnp.float32)
            out = attention_xla(q, k_cache[:, :L - 1], v_cache[:, :L - 1], bias=bias)
        else:
            out = scaled_dot_product_attention(q, k, v, causal=True, segment_ids=segment_ids)
        out = out.reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out), new_cache


class OPTDecoderLayer(nn.Module):
    config: OPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, *, segment_ids=None, cache_kv=None):
        cfg = self.config
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        attn, new_cache = OPTAttention(cfg, dtype=self.dtype, name="self_attn")(
            h, positions, segment_ids=segment_ids, cache_kv=cache_kv)
        x = x + attn
        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h) if cfg.activation_function == "relu" else nn.gelu(h)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x, new_cache


class OPTModule(nn.Module):
    config: OPTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype)
        # OPT offsets positions by 2 (padding idx legacy)
        self.embed_positions = nn.Embed(cfg.max_position_embeddings + 2, cfg.hidden_size,
                                        dtype=self.dtype)
        self.layers = [OPTDecoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(cfg.num_hidden_layers)]
        if cfg.do_layer_norm_before:
            self.final_layer_norm = nn.LayerNorm(dtype=self.dtype)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, input_ids=None, positions=None, *, inputs_embeds=None,
                 segment_ids=None, cache: Optional[KVCache] = None):
        cfg = self.config
        x = self.embed_tokens(input_ids) if inputs_embeds is None else inputs_embeds
        b, s = x.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        x = x + self.embed_positions(jnp.maximum(positions, 0) + 2)
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            layer_cache = None if cache is None else (cache.k[i], cache.v[i])
            x, nc = layer(x, positions, segment_ids=segment_ids, cache_kv=layer_cache)
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        if cfg.do_layer_norm_before:
            x = self.final_layer_norm(x)
        out_cache = None
        if cache is not None:
            valid = (positions >= 0).sum(axis=-1).astype(jnp.int32)
            out_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v), cache.lengths + valid)
        logits = self.embed_tokens.attend(x.astype(self.dtype))
        return logits, out_cache


_OPT_KEY_MAP = (
    (r"^model\.decoder\.", r""),
    (r"^decoder\.", r""),
    (r"embed_tokens\.weight$", r"embed_tokens.embedding"),
    (r"embed_positions\.weight$", r"embed_positions.embedding"),
    (r"\.layers\.(\d+)\.", r".layers_\1."),
    (r"^layers\.(\d+)\.", r"layers_\1."),
    (r"(_layer_norm|layer_norm)\.weight$", r"\1.scale"),
    (r"^final_layer_norm\.weight$", r"final_layer_norm.scale"),
    (r"\.weight$", r".kernel"),
)


class OPTForCausalLM(PretrainedModel):
    config_class = OPTConfig
    module_class = OPTModule
    torch_key_map = _OPT_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 4), jnp.int32),), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        flat = {k: v for k, v in flat.items() if not k.startswith("lm_head")}
        from ...core.modeling import convert_torch_state_dict

        return convert_torch_state_dict(flat, cls.torch_key_map)

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config, batch, max_len, dtype=dtype or self.dtype)
