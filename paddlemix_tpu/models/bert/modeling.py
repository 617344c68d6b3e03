"""BERT / RoBERTa / XLM-RoBERTa encoders, TPU-native.

Rebuild of the reference's transformers clone for these families
(ppdiffusers/ppdiffusers/transformers/bert + xlm_roberta; consumed by
alt_diffusion's RobertaSeriesModelWithTransformation and VisualGLM-style
text stacks). Post-LN transformer encoder with BERT embeddings (word +
learned position + token type, LayerNorm), an optional tanh pooler, and the
Alt-Diffusion projection head. HF torch checkpoints load through the key map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class BertConfig(BaseConfig):
    model_type = "bert"
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # RoBERTa/XLM-R: position ids count non-pad tokens, offset past pad id
    position_offset: int = 0
    # Alt-Diffusion head
    project_dim: Optional[int] = None


class BertLayer(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.config
        d = cfg.hidden_size
        nh = cfg.num_attention_heads
        hd = d // nh
        b, s = x.shape[:2]
        q = nn.Dense(d, dtype=self.dtype, name="query")(x).reshape(b, s, nh, hd)
        k = nn.Dense(d, dtype=self.dtype, name="key")(x).reshape(b, s, nh, hd)
        v = nn.Dense(d, dtype=self.dtype, name="value")(x).reshape(b, s, nh, hd)
        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                             -1e9).astype(jnp.float32)
        attn = scaled_dot_product_attention(q, k, v, bias=bias).reshape(b, s, d)
        attn = nn.Dense(d, dtype=self.dtype, name="attn_out")(attn)
        # post-LN (original BERT): sublayer -> residual -> LayerNorm
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attn_ln")(x + attn)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="inter_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="out_dense")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="out_ln")(x + h)


class BertModule(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)

        words = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="word_embeddings")(input_ids)
        if cfg.position_offset:
            pos_ids = jnp.cumsum(attention_mask, axis=1) * attention_mask \
                + cfg.pad_token_id
        else:
            pos_ids = jnp.broadcast_to(jnp.arange(s), (b, s))
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        types = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_ln")(words + pos + types)

        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, dtype=self.dtype,
                          name=f"layers_{i}")(x, attention_mask)

        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(x[:, 0]))
        return x, pooled


_BERT_KEY_MAP = (
    (r"^(bert|roberta|model)\.", r""),
    (r"^embeddings\.(word|position|token_type)_embeddings\.weight$",
     r"\1_embeddings.embedding"),
    (r"^embeddings\.LayerNorm\.(weight|gamma)$", r"emb_ln.scale"),
    (r"^embeddings\.LayerNorm\.(bias|beta)$", r"emb_ln.bias"),
    (r"^encoder\.layer\.(\d+)\.", r"layers_\1."),
    (r"\.attention\.self\.(query|key|value)\.", r".\1."),
    (r"\.attention\.output\.dense\.", r".attn_out."),
    (r"\.attention\.output\.LayerNorm\.(weight|gamma)$", r".attn_ln.scale"),
    (r"\.attention\.output\.LayerNorm\.(bias|beta)$", r".attn_ln.bias"),
    (r"\.intermediate\.dense\.", r".inter_dense."),
    (r"\.output\.dense\.", r".out_dense."),
    (r"\.output\.LayerNorm\.(weight|gamma)$", r".out_ln.scale"),
    (r"\.output\.LayerNorm\.(bias|beta)$", r".out_ln.bias"),
    (r"^pooler\.dense\.", r"pooler."),
    (r"\.weight$", r".kernel"),
)


class BertModel(PretrainedModel):
    config_class = BertConfig
    module_class = BertModule
    torch_key_map = _BERT_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 8), jnp.int32),), {}

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        return self.module.apply({"params": self.params},
                                 jnp.asarray(input_ids), attention_mask,
                                 token_type_ids)


@dataclasses.dataclass
class XLMRobertaConfig(BertConfig):
    model_type = "xlm-roberta"
    vocab_size: int = 250002
    type_vocab_size: int = 1
    pad_token_id: int = 1
    position_offset: int = 2
    layer_norm_eps: float = 1e-5


class XLMRobertaModel(BertModel):
    config_class = XLMRobertaConfig


class _RobertaSeriesModule(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.base = BertModule(self.config, dtype=self.dtype)
        self.transformation = nn.Dense(self.config.project_dim or
                                       self.config.hidden_size,
                                       dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None):
        hidden, pooled = self.base(input_ids, attention_mask)
        projection_state = self.transformation(hidden)
        return projection_state, hidden, pooled


class RobertaSeriesModelWithTransformation(PretrainedModel):
    """Alt-Diffusion text encoder (reference
    alt_diffusion/modeling_roberta_series.py:78): XLM-R + a linear
    transformation projecting hidden states to the UNet context width."""

    config_class = XLMRobertaConfig
    module_class = _RobertaSeriesModule
    torch_key_map = (
        (r"^(roberta|base_model)\.", r"base."),
        (r"^base\.embeddings\.(word|position|token_type)_embeddings\.weight$",
         r"base.\1_embeddings.embedding"),
        (r"^base\.embeddings\.LayerNorm\.(weight|gamma)$", r"base.emb_ln.scale"),
        (r"^base\.embeddings\.LayerNorm\.(bias|beta)$", r"base.emb_ln.bias"),
        (r"\.encoder\.layer\.(\d+)\.", r".layers_\1."),
        (r"\.attention\.self\.(query|key|value)\.", r".\1."),
        (r"\.attention\.output\.dense\.", r".attn_out."),
        (r"\.attention\.output\.LayerNorm\.(weight|gamma)$", r".attn_ln.scale"),
        (r"\.attention\.output\.LayerNorm\.(bias|beta)$", r".attn_ln.bias"),
        (r"\.intermediate\.dense\.", r".inter_dense."),
        (r"\.output\.dense\.", r".out_dense."),
        (r"\.output\.LayerNorm\.(weight|gamma)$", r".out_ln.scale"),
        (r"\.output\.LayerNorm\.(bias|beta)$", r".out_ln.bias"),
        (r"\.pooler\.dense\.", r".pooler."),
        (r"\.weight$", r".kernel"),
    )

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 8), jnp.int32),), {}

    def __call__(self, input_ids, attention_mask=None,
                 output_hidden_states=False):
        proj, hidden, pooled = self.module.apply(
            {"params": self.params}, jnp.asarray(input_ids), attention_mask)
        # SD-pipeline duck-typing: [0] is the context tensor
        return proj, pooled
