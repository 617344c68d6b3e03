"""CLAP text tower (reference paddlemix/models/audioldm2/clap_module/ and
ppdiffusers/transformers CLAP): RoBERTa-style post-LN encoder + first-token
pooler + 2-layer MLP projection. Produces the pooled text embedding AudioLDM2
feeds (as a length-1 sequence) into its projection/GPT-2 stack."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class ClapTextConfig(BaseConfig):
    model_type = "clap_text"
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 1
    projection_dim: int = 512
    projection_hidden_act: str = "relu"


class RobertaLayer(nn.Module):
    """Post-LN encoder layer (BERT/RoBERTa ordering)."""

    config: ClapTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, _ = x.shape
        nh = cfg.num_attention_heads
        hd = cfg.hidden_size // nh
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="value")(x)
        attn = scaled_dot_product_attention(
            q.reshape(b, s, nh, hd), k.reshape(b, s, nh, hd),
            v.reshape(b, s, nh, hd)).reshape(b, s, cfg.hidden_size)
        attn = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attn_norm")(x + attn)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="out_norm")(x + h)


class ClapTextModule(nn.Module):
    config: ClapTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="word_embeddings")(input_ids)
        # RoBERTa position ids start at pad_token_id + 1
        pos = jnp.arange(s) + cfg.pad_token_id + 1
        x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         dtype=self.dtype, name="position_embeddings")(pos)[None]
        x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_norm")(x)
        for i in range(cfg.num_hidden_layers):
            x = RobertaLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(x[:, 0]))
        # CLAP projection: linear -> relu -> linear
        p = nn.Dense(cfg.projection_dim, dtype=self.dtype, name="projection_0")(pooled)
        p = nn.relu(p)
        text_embeds = nn.Dense(cfg.projection_dim, dtype=self.dtype,
                               name="projection_2")(p)
        return text_embeds, x


class ClapTextModelWithProjection(PretrainedModel):
    config_class = ClapTextConfig
    module_class = ClapTextModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 4), jnp.int32),), {})
