"""GPT-2 decoder (reference ppdiffusers/transformers/gpt2 — the language model
behind AudioLDM2's continuous-prompt generation and unidiffuser's caption
decoder). Pre-LN blocks, learned positions, fused qkv; same explicit KVCache
design as models/llama. Torch GPT-2 stores Conv1D weights already (in, out),
so checkpoint conversion must NOT transpose them (handled in
convert_foreign_state_dict)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ...ops.attention import attention_xla
from ..llama.modeling import KVCache


@dataclasses.dataclass
class GPT2Config(BaseConfig):
    model_type = "gpt2"
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: Optional[int] = None
    layer_norm_epsilon: float = 1e-5
    bos_token_id: int = 50256
    eos_token_id: int = 50256

    # aliases used by shared cache/generation utilities
    @property
    def num_hidden_layers(self):
        return self.n_layer

    @property
    def kv_heads(self):
        return self.n_head

    @property
    def head_dim_(self):
        return self.n_embd // self.n_head

    @property
    def hidden_size(self):
        return self.n_embd


class GPT2Attention(nn.Module):
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, *, segment_ids=None, cache_kv=None):
        cfg = self.config
        b, s, _ = x.shape
        nh, hd = cfg.n_head, cfg.head_dim_
        qkv = nn.Dense(3 * cfg.n_embd, dtype=self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
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
            out = scaled_dot_product_attention(q, k, v, causal=True,
                                               segment_ids=segment_ids)
        out = out.reshape(b, s, cfg.n_embd)
        return nn.Dense(cfg.n_embd, dtype=self.dtype, name="c_proj")(out), new_cache


class GPT2Block(nn.Module):
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, *, segment_ids=None, cache_kv=None):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                         name="ln_1")(x)
        attn, new_cache = GPT2Attention(cfg, dtype=self.dtype, name="attn")(
            h, positions, segment_ids=segment_ids, cache_kv=cache_kv)
        x = x + attn
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype,
                         name="ln_2")(x)
        inner = cfg.n_inner or 4 * cfg.n_embd
        h = nn.Dense(inner, dtype=self.dtype, name="mlp_c_fc")(h)
        h = nn.gelu(h, approximate=True)
        x = x + nn.Dense(cfg.n_embd, dtype=self.dtype, name="mlp_c_proj")(h)
        return x, new_cache


class GPT2Module(nn.Module):
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.wte = nn.Embed(cfg.vocab_size, cfg.n_embd, dtype=self.dtype)
        self.wpe = nn.Embed(cfg.n_positions, cfg.n_embd, dtype=self.dtype)
        self.h = [GPT2Block(cfg, dtype=self.dtype, name=f"h_{i}")
                  for i in range(cfg.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype)

    def embed(self, input_ids):
        return self.wte(input_ids)

    def hidden_states(self, input_ids=None, positions=None, *, inputs_embeds=None,
                      segment_ids=None, cache: Optional[KVCache] = None):
        cfg = self.config
        x = self.wte(input_ids) if inputs_embeds is None else inputs_embeds
        b, s = x.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        x = x + self.wpe(jnp.clip(positions, 0, cfg.n_positions - 1))
        new_k, new_v = [], []
        for i, layer in enumerate(self.h):
            layer_cache = None if cache is None else (cache.k[i], cache.v[i])
            x, nc = layer(x, positions, segment_ids=segment_ids, cache_kv=layer_cache)
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        x = self.ln_f(x)
        out_cache = None
        if cache is not None:
            valid = (positions >= 0).sum(axis=-1).astype(jnp.int32)
            out_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v),
                                cache.lengths + valid)
        return x, out_cache

    def __call__(self, input_ids=None, positions=None, *, inputs_embeds=None,
                 segment_ids=None, cache: Optional[KVCache] = None):
        x, out_cache = self.hidden_states(
            input_ids, positions, inputs_embeds=inputs_embeds,
            segment_ids=segment_ids, cache=cache)
        logits = self.wte.attend(x.astype(self.dtype))
        return logits, out_cache


_GPT2_KEY_MAP = (
    (r"^transformer\.", r""),
    (r"^wte\.weight$", r"wte.embedding"),
    (r"^wpe\.weight$", r"wpe.embedding"),
    (r"^h\.(\d+)\.", r"h_\1."),
    (r"\.mlp\.c_fc\.", r".mlp_c_fc."),
    (r"\.mlp\.c_proj\.", r".mlp_c_proj."),
    (r"(ln_1|ln_2|ln_f)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class GPT2Model(PretrainedModel):
    config_class = GPT2Config
    module_class = GPT2Module
    torch_key_map = _GPT2_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 4), jnp.int32),), {})

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        from ...core.modeling import convert_torch_state_dict

        flat = {k: v for k, v in flat.items()
                if not k.startswith("lm_head") and ".attn.bias" not in k
                and ".attn.masked_bias" not in k}
        out = convert_torch_state_dict(flat, cls.torch_key_map)
        # GPT-2 Conv1D kernels are stored (in, out) — already flax layout, but
        # convert_torch_state_dict transposes 2D ".kernel" entries; undo that.
        for name in list(out):
            if name.endswith(".kernel") and any(
                    t in name for t in ("c_attn", "c_proj", "c_fc")):
                out[name] = out[name].T
        return out

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config, batch, max_len, dtype=dtype or self.dtype)

    def generate_hidden_states(self, inputs_embeds, num_new: int = 8):
        """AudioLDM2's generate_language_model (reference
        pipelines/audioldm2/pipeline_audioldm2.py:168-220): autoregressively
        extend a sequence of *embeddings*, returning the num_new generated
        hidden states. Prefill + lax.scan decode over the KV cache."""
        b, length, _ = inputs_embeds.shape
        params = self.params
        module = self.module
        method = self.module_class.hidden_states
        cache = self.init_cache(b, length + num_new)
        positions = jnp.broadcast_to(jnp.arange(length), (b, length))
        hidden, cache = module.apply({"params": params}, None,
                                     positions=positions,
                                     inputs_embeds=inputs_embeds.astype(self.dtype),
                                     cache=cache, method=method)
        last = hidden[:, -1:, :]

        def step(carry, _):
            last, cache = carry
            pos = cache.lengths[:, None]
            h, cache = module.apply({"params": params}, None, positions=pos,
                                    inputs_embeds=last.astype(self.dtype),
                                    cache=cache, method=method)
            return (h[:, -1:, :], cache), h[:, -1, :]

        (_, _), outs = jax.lax.scan(step, (last, cache), None, length=num_new - 1)
        return jnp.concatenate([last, jnp.swapaxes(outs, 0, 1)], axis=1)
