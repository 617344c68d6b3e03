"""MiniGPT4: EVA-ViT + Q-Former + linear projector + Vicuna (Llama).

Rebuild of the reference MiniGPT4 (paddlemix/models/minigpt4/modeling.py,
2210 LoC). Structurally BLIP-2 with a Llama-family LLM and a single linear
llama_proj; prompts wrap the image tokens between '###Human: <Img>' markers —
here the splice is the same static cumsum scatter as LLaVA."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ..blip2.modeling import QFormer, QFormerConfig
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.configuration import LlamaConfig
from ..llama.modeling import KVCache, LlamaModule, greedy_generate


@dataclasses.dataclass
class MiniGPT4Config(BaseConfig):
    model_type = "minigpt4"
    vision_config: Optional[Dict[str, Any]] = None
    qformer_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    num_query_tokens: int = 32
    image_token_id: int = 32000

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.qformer_config = self.qformer_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_dict(dict(self.vision_config, patch_bias=True,
                                               use_pre_layernorm=False,
                                               post_layernorm_full=True))

    @property
    def qformer(self) -> QFormerConfig:
        return QFormerConfig.from_dict(self.qformer_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(self.text_config)


class MiniGPT4Module(nn.Module):
    config: MiniGPT4Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.query_tokens = self.param("query_tokens", nn.initializers.normal(0.02),
                                       (1, cfg.num_query_tokens, cfg.qformer.hidden_size))
        self.qformer = QFormer(cfg.qformer, dtype=self.dtype)
        self.llama_proj = nn.Dense(cfg.text.hidden_size, dtype=self.dtype)
        self.language_model = LlamaModule(cfg.text, dtype=self.dtype)

    def encode_image(self, pixel_values):
        image_embeds, _ = self.vision_model(pixel_values)
        queries = jnp.broadcast_to(
            self.query_tokens, (pixel_values.shape[0], *self.query_tokens.shape[1:])
        ).astype(self.dtype)
        q = self.qformer(queries, image_embeds)
        return self.llama_proj(q)

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
            feats = self.encode_image(pixel_values)
            inputs_embeds = self.splice(input_ids, feats)
        return self.language_model(input_ids, positions, inputs_embeds=inputs_embeds,
                                   segment_ids=segment_ids, cache=cache)


class MiniGPT4ForConditionalGeneration(PretrainedModel):
    config_class = MiniGPT4Config
    module_class = MiniGPT4Module

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        """Vision tower + Q-Former share BLIP-2's HF layout (MiniGPT4 IS
        BLIP-2 up to the projector, reference minigpt4/modeling.py:1229+);
        the projector is llama_proj / language_projection. The Llama half
        follows the usual llama renames."""
        import re as _re

        from ..blip2.modeling import Blip2ForConditionalGeneration

        bridge, llm = {}, {}
        for k, v in flat.items():
            k = _re.sub(r"^(language_projection|llm_proj)\.", "llama_proj.", k)
            if k.startswith("language_model."):
                llm[k] = v
            else:
                bridge[k] = v
        out = Blip2ForConditionalGeneration.convert_foreign_state_dict(bridge, None)
        if llm:
            from ...core.modeling import convert_torch_state_dict

            out.update(convert_torch_state_dict(llm, (
                (r"^language_model\.model\.", r"language_model."),
                (r"language_model\.embed_tokens\.weight$",
                 r"language_model.embed_tokens.embedding"),
                (r"\.layers\.(\d+)\.", r".layers_\1."),
                (r"(layernorm|norm)\.weight$", r"\1.scale"),
                (r"\.weight$", r".kernel"),
            )))
        return out

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = config.num_query_tokens
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)

    def generate(self, input_ids, pixel_values=None, attention_mask=None,
                 max_new_tokens: int = 32, **kwargs):
        inputs_embeds = None
        if pixel_values is not None:
            feats = self.module.apply({"params": self.params}, pixel_values,
                                      method=self.module.encode_image)
            inputs_embeds = self.module.apply({"params": self.params},
                                              jnp.asarray(input_ids), feats,
                                              method=self.module.splice)

        class _View:
            config = self.config.text
            params = self.params["language_model"]
            module = LlamaModule(self.config.text, dtype=self.dtype)
            dtype = self.dtype

            def init_cache(sf, batch, max_len, dtype=None):
                return KVCache.create(self.config.text, batch, max_len,
                                      dtype=dtype or self.dtype)

        return greedy_generate(_View(), input_ids, attention_mask,
                               max_new_tokens=max_new_tokens,
                               inputs_embeds=inputs_embeds, **kwargs)
