"""Prior transformer (Kandinsky / unCLIP): diffusion in CLIP image-embed space.

Rebuild of the reference prior (ppdiffusers/ppdiffusers/models/
prior_transformer.py): the sequence is [text token embeds; pooled text; time
embed; noised image embed; learned query]; a causal-free transformer predicts
the denoised image embedding read from the final query position."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from .embeddings import TimestepEmbedding, Timesteps


@dataclasses.dataclass
class PriorTransformerConfig(BaseConfig):
    model_type = "prior_transformer"
    num_attention_heads: int = 32
    attention_head_dim: int = 64
    num_layers: int = 20
    embedding_dim: int = 768       # CLIP embed dim
    num_embeddings: int = 77       # text sequence length
    additional_embeddings: int = 4 # pooled, time, image, query

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim


class PriorBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.num_heads * self.head_dim
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        b, s = h.shape[:2]
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * self.num_heads, self.head_dim), 3, axis=2)
        attn = scaled_dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(attn)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(h)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=True))


class PriorTransformerModule(nn.Module):
    config: PriorTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, timestep, proj_embedding, encoder_hidden_states):
        """hidden_states: (B, D_embed) noised image embed; proj_embedding:
        (B, D_embed) pooled text; encoder_hidden_states: (B, 77, D_embed)."""
        cfg = self.config
        d = cfg.inner_dim
        b = hidden_states.shape[0]
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t_emb = Timesteps(d, flip_sin_to_cos=True, downscale_freq_shift=0.0)(timestep)
        t_emb = TimestepEmbedding(d, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype))

        txt = nn.Dense(d, dtype=self.dtype, name="encoder_proj")(encoder_hidden_states)
        pooled = nn.Dense(d, dtype=self.dtype, name="embedding_proj")(proj_embedding)
        img = nn.Dense(d, dtype=self.dtype, name="proj_in")(hidden_states)
        query = self.param("prd_embedding", nn.initializers.normal(0.02), (1, d))
        seq = jnp.concatenate([
            txt,
            pooled[:, None, :],
            t_emb[:, None, :],
            img[:, None, :],
            jnp.broadcast_to(query, (b, 1, d)).astype(txt.dtype),
        ], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (cfg.num_embeddings + cfg.additional_embeddings, d))
        seq = seq + pos[None, : seq.shape[1]].astype(seq.dtype)
        for i in range(cfg.num_layers):
            seq = PriorBlock(cfg.num_attention_heads, cfg.attention_head_dim,
                             dtype=self.dtype, name=f"blocks_{i}")(seq)
        seq = nn.LayerNorm(dtype=self.dtype, name="norm_out")(seq)
        return nn.Dense(cfg.embedding_dim, dtype=self.dtype, name="proj_out")(seq[:, -1])


class PriorTransformer(PretrainedModel):
    config_class = PriorTransformerConfig
    module_class = PriorTransformerModule

    @classmethod
    def example_inputs(cls, config):
        d = config.embedding_dim
        return (jnp.zeros((1, d)), jnp.asarray(0), jnp.zeros((1, d)),
                jnp.zeros((1, config.num_embeddings, d))), {}
