"""Qwen-VL (v1): ViT-bigG tower + cross-attention Resampler + QWen LLM.

Rebuild of the reference (paddlemix/models/qwen_vl/modeling.py 461 LoC +
qwen_vit.py 312 + visual.py 205): the real ViT-bigG trunk (448px/14,
width 1664, 48 layers, bicubic-interpolated 16x16 abs pos embed) feeds a
256-query Resampler with 2D sincos pos embeds (visual.py:73-138); visual
tokens are spliced between <img>/</img> markers in the prompt — here via the
same static cumsum scatter as LLaVA. The QWen LLM maps onto models.llama
(rotary + RMSNorm + qkv attention bias) with the QWen long-context options
surfaced in LlamaConfig: NTK-aware rope (`rope_ntk_alpha`) and logn attention
scaling (`use_logn_attn`) — in the reference those live in PaddleNLP's QWen
backbone (SURVEY.md L0)."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel, convert_torch_state_dict
from ..llama.configuration import LlamaConfig
from ..llama.modeling import KVCache, LlamaModule
from .visual import QwenVisionConfig, QwenVisionTransformer


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
    def vision(self) -> QwenVisionConfig:
        d = dict(self.vision_config)
        # accept CLIP-style aliases (earlier configs / HF "visual" blocks)
        alias = {"hidden_size": "width", "num_hidden_layers": "layers",
                 "num_attention_heads": "heads"}
        for src, dst in alias.items():
            if src in d and dst not in d:
                d[dst] = d.pop(src)
            d.pop(src, None)
        if "intermediate_size" in d:
            inter = d.pop("intermediate_size")
            if "width" in d and "mlp_ratio" not in d:
                d["mlp_ratio"] = inter / d["width"]
        d.setdefault("output_dim", self.text.hidden_size)
        return QwenVisionConfig.from_dict(d)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(dict(self.text_config, attention_bias=True))


class QwenVLModule(nn.Module):
    config: QwenVLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.visual = QwenVisionTransformer(cfg.vision, num_queries=cfg.num_queries,
                                            dtype=self.dtype)
        self.language_model = LlamaModule(cfg.text, dtype=self.dtype)

    def encode_images(self, pixel_values):
        return self.visual(pixel_values)

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


# HF/paddle Qwen-VL checkpoint keys -> flax tree. The LLM half
# (transformer.h.N.*) reuses the QWen->llama renames; the visual half maps
# onto visual.py's checkpoint-shaped tree.
_QWEN_VL_KEY_MAP = (
    (r"^transformer\.visual\.", r"visual."),
    (r"^visual\.transformer\.resblocks\.(\d+)\.", r"visual.resblocks_\1."),
    (r"^visual\.resblocks\.(\d+)\.", r"visual.resblocks_\1."),
    (r"\.attn\.in_proj\.", r".in_proj."),
    (r"\.attn\.out_proj\.", r".out_proj."),
    (r"\.mlp\.c_fc\.", r".c_fc."),
    (r"\.mlp\.c_proj\.", r".c_proj."),
    # QWen LLM (PaddleNLP/HF QWen naming) -> llama module names
    (r"^transformer\.wte\.", r"language_model.embed_tokens."),
    (r"^transformer\.h\.(\d+)\.", r"language_model.layers_\1."),
    (r"^transformer\.ln_f\.", r"language_model.norm."),
    (r"^lm_head\.", r"language_model.lm_head."),
    (r"\.attn\.c_attn\.", r".self_attn.qkv_proj."),
    (r"\.attn\.c_proj\.", r".self_attn.o_proj."),
    (r"^(language_model\.layers_\d+)\.ln_1\.weight$", r"\1.input_layernorm.scale"),
    (r"^(language_model\.layers_\d+)\.ln_2\.weight$", r"\1.post_attention_layernorm.scale"),
    (r"\.mlp\.w1\.", r".mlp.up_proj."),
    (r"\.mlp\.w2\.", r".mlp.gate_proj."),
    (r"(ln_q|ln_kv|ln_post|ln_pre|ln_1|ln_2)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class QwenVLForConditionalGeneration(PretrainedModel):
    config_class = QwenVLConfig
    module_class = QwenVLModule
    torch_key_map = _QWEN_VL_KEY_MAP

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        out = {}
        for k, v in flat.items():
            # torch nn.MultiheadAttention packs q/k/v ([Q;K;V] global layout)
            # in the Resampler; the paddle port stores them separately
            m = re.match(r"^(.*attn_pool)\.attn\.in_proj_(weight|bias)$", k)
            if m:
                prefix, kind = m.groups()
                q, kk, vv = np.split(v, 3, axis=0)
                suffix = "weight" if kind == "weight" else "bias"
                out[f"{prefix}.q_proj.{suffix}"] = q
                out[f"{prefix}.k_proj.{suffix}"] = kk
                out[f"{prefix}.v_proj.{suffix}"] = vv
            elif re.search(r"attn_pool\.attn\.out_proj", k):
                out[k.replace("attn.out_proj", "out_proj")] = v
            else:
                out[k] = v
        return convert_torch_state_dict(out, cls.torch_key_map)

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = config.num_queries
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)
