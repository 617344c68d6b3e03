"""CoCa: contrastive captioner on the CLIP towers.

Rebuild of the reference CoCa (paddlemix/models/clip/coca_model.py +
CoCaLoss clip/loss.py:195): vision tower -> attentional pooling (contrastive
token + caption tokens), unimodal causal text decoder for the contrastive
embedding, multimodal decoder (cross-attention to pooled image tokens) for
captioning. Losses: InfoNCE (reuses clip_contrastive_loss) + caption CE."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ..layers import EncoderBlock, MultiHeadAttention
from .configuration import CLIPTextConfig, CLIPVisionConfig
from .modeling import CLIPTextTransformer, CLIPVisionTransformer, clip_contrastive_loss


@dataclasses.dataclass
class CoCaConfig(BaseConfig):
    model_type = "coca"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    projection_dim: int = 512
    num_img_queries: int = 255  # +1 contrastive query
    multimodal_layers: int = 4
    logit_scale_init_value: float = 2.6592

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> CLIPTextConfig:
        return CLIPTextConfig.from_dict(self.text_config)


class AttentionalPooler(nn.Module):
    num_queries: int
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_tokens):
        b = image_tokens.shape[0]
        queries = self.param("query", nn.initializers.normal(0.02),
                             (self.num_queries, self.dim))
        q = jnp.broadcast_to(queries, (b, self.num_queries, self.dim)).astype(self.dtype)
        kv = nn.LayerNorm(dtype=self.dtype, name="ln_k")(image_tokens)
        out = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="ln_q")(q), kv)
        return q + out


class MultimodalDecoderLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_tokens):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   name="self_attn")(h, causal=True)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_cross")(x)
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   name="cross_attn")(h, image_tokens)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        return x + nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(
            nn.gelu(h, approximate=False))


class CoCaModule(nn.Module):
    config: CoCaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.text_model = CLIPTextTransformer(cfg.text, dtype=self.dtype)
        d = cfg.text.hidden_size
        self.img_pooler = AttentionalPooler(cfg.num_img_queries + 1, d, dtype=self.dtype)
        self.visual_projection = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype)
        self.text_projection = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype)
        self.multimodal_layers = [
            MultimodalDecoderLayer(cfg.text.num_attention_heads,
                                   cfg.text.intermediate_size, dtype=self.dtype,
                                   name=f"multimodal_{i}")
            for i in range(cfg.multimodal_layers)]
        self.caption_head = nn.Dense(cfg.text.vocab_size, use_bias=False, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(cfg.logit_scale_init_value), ())

    def __call__(self, pixel_values, input_ids):
        img_tokens, _ = self.vision_model(pixel_values)
        pooled = self.img_pooler(img_tokens)
        contrastive_img = self.visual_projection(pooled[:, 0])
        caption_img_tokens = pooled[:, 1:]

        txt_seq, txt_pooled = self.text_model(input_ids)
        contrastive_txt = self.text_projection(txt_pooled)

        x = txt_seq
        for layer in self.multimodal_layers:
            x = layer(x, caption_img_tokens)
        caption_logits = self.caption_head(x)

        norm = lambda v: v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return (norm(contrastive_img), norm(contrastive_txt), caption_logits,
                jnp.exp(self.logit_scale))


class CoCaModel(PretrainedModel):
    config_class = CoCaConfig
    module_class = CoCaModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        return (jnp.zeros((1, v.image_size, v.image_size, 3)),
                jnp.zeros((1, 4), jnp.int32)), {}


def coca_loss(img_emb, txt_emb, caption_logits, labels, logit_scale,
              caption_weight: float = 2.0, contrastive_weight: float = 1.0,
              ignore_index: int = -100, axis_name=None):
    """CoCaLoss (reference clip/loss.py:195): contrastive + caption CE."""
    from ..llava.modeling import llava_loss

    con = clip_contrastive_loss(img_emb, txt_emb, logit_scale, axis_name=axis_name)
    cap = llava_loss(caption_logits, labels, ignore_index)
    return contrastive_weight * con + caption_weight * cap
