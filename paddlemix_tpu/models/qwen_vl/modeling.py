"""Qwen-VL (v1): ViT-bigG tower + cross-attention Resampler + QWen LLM.

Rebuild of the reference (paddlemix/models/qwen_vl/modeling.py, 1655 LoC):
the visual Resampler compresses the patch grid to 256 learned queries with a
single cross-attention (a Q-Former-lite); visual tokens are spliced between
<img>/<img> markers in the prompt — here via the same static cumsum scatter as
LLaVA. The QWen LLM maps onto models.llama (rotary + RMSNorm + qkv bias)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.configuration import LlamaConfig
from ..llama.modeling import KVCache, LlamaModule


@dataclasses.dataclass
class QwenVLConfig(BaseConfig):
    model_type = "qwen_vl"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    num_queries: int = 256
    image_token_id: int = 151857  # placeholder id used for spliced tokens

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(dict(self.text_config, attention_bias=True))


class Resampler(nn.Module):
    """num_queries learned queries cross-attend the patch grid once
    (reference qwen_vl visual.py Resampler)."""

    num_queries: int
    out_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats):
        b, n, d_in = image_feats.shape
        d = self.out_dim
        queries = self.param("query", nn.initializers.normal(0.02),
                             (self.num_queries, d))
        kv = nn.Dense(d, dtype=self.dtype, name="kv_proj")(image_feats)
        kv = nn.LayerNorm(dtype=self.dtype, name="ln_kv")(kv)
        q = nn.LayerNorm(dtype=self.dtype, name="ln_q")(
            jnp.broadcast_to(queries, (b, self.num_queries, d)).astype(self.dtype))
        hd = d // self.num_heads
        qq = nn.Dense(d, dtype=self.dtype, name="q_proj")(q).reshape(
            b, self.num_queries, self.num_heads, hd)
        kk = nn.Dense(d, dtype=self.dtype, name="k_proj")(kv).reshape(b, n, self.num_heads, hd)
        vv = nn.Dense(d, dtype=self.dtype, name="v_proj")(kv).reshape(b, n, self.num_heads, hd)
        out = scaled_dot_product_attention(qq, kk, vv).reshape(b, self.num_queries, d)
        out = nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
        return nn.LayerNorm(dtype=self.dtype, name="ln_post")(out)


class QwenVLModule(nn.Module):
    config: QwenVLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.visual = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.resampler = Resampler(cfg.num_queries, cfg.text.hidden_size,
                                   dtype=self.dtype)
        self.language_model = LlamaModule(cfg.text, dtype=self.dtype)

    def encode_images(self, pixel_values):
        feats, _ = self.visual(pixel_values)
        return self.resampler(feats[:, 1:])  # drop CLS

    def splice(self, input_ids, image_features):
        token_embeds = self.language_model.embed(input_ids)
        is_img = input_ids == self.config.image_token_id
        flat = image_features.reshape(1, -1, image_features.shape[-1])
        idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0,
                       flat.shape[1] - 1)
        gathered = jnp.take_along_axis(
            jnp.broadcast_to(flat, (input_ids.shape[0], *flat.shape[1:])),
            idx[:, :, None], axis=1)
        return jnp.where(is_img[:, :, None], gathered.astype(token_embeds.dtype),
                         token_embeds)

    def __call__(self, input_ids, pixel_values=None, positions=None, *,
                 segment_ids=None, cache: Optional[KVCache] = None):
        inputs_embeds = None
        if pixel_values is not None:
            feats = self.encode_images(pixel_values)
            inputs_embeds = self.splice(input_ids, feats)
        return self.language_model(input_ids, positions, inputs_embeds=inputs_embeds,
                                   segment_ids=segment_ids, cache=cache)


class QwenVLForConditionalGeneration(PretrainedModel):
    config_class = QwenVLConfig
    module_class = QwenVLModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = config.num_queries
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)
