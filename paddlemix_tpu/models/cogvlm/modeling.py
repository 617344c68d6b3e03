"""CogVLM / CogAgent: vision-expert attention VLM.

Rebuild of the reference CogVLM (paddlemix/models/cogvlm/modeling.py, 2131
LoC): a llama-style decoder where image-token positions route through a
SEPARATE set of attention/MLP weights (the "vision expert") while text tokens
use the language weights; both share one attention softmax. TPU note: both
expert projections run densely and a where() selects per position — no gather/
scatter, fully static (token-dropless expert routing is bandwidth-cheap at
2 experts)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import apply_rope, rope_cos_sin, scaled_dot_product_attention
from ...ops.attention import SegmentIds
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.configuration import LlamaConfig
from ..llama.modeling import RMSNorm


@dataclasses.dataclass
class CogVLMConfig(BaseConfig):
    model_type = "cogvlm"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    image_token_id: int = 32000

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(self.text_config)


class VisionExpertAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, is_image, segment_ids=None):
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim_
        nh = cfg.num_attention_heads

        def proj(name):
            return nn.Dense(nh * hd * 3, use_bias=False, dtype=self.dtype, name=name)(x)

        qkv_lang = proj("language_expert_qkv")
        qkv_vis = proj("vision_expert_qkv")
        qkv = jnp.where(is_image[:, :, None], qkv_vis, qkv_lang)
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * nh, hd), 3, axis=2)
        cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        out = scaled_dot_product_attention(q, k, v, causal=True, segment_ids=segment_ids)
        out = out.reshape(b, s, nh * hd)
        out_lang = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                            name="language_expert_dense")(out)
        out_vis = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                           name="vision_expert_dense")(out)
        return jnp.where(is_image[:, :, None], out_vis, out_lang)


class VisionExpertMLP(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_image):
        cfg = self.config

        def swiglu(prefix):
            gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_gate_proj")(x)
            up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                          name=f"{prefix}_up_proj")(x)
            return nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_down_proj")(nn.silu(gate) * up)

        return jnp.where(is_image[:, :, None], swiglu("vision"), swiglu("language"))


class CogVLMModule(nn.Module):
    config: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.mm_projector = nn.Dense(cfg.text.hidden_size, dtype=self.dtype)
        t = cfg.text
        self.embed_tokens = nn.Embed(t.vocab_size, t.hidden_size, dtype=self.dtype)
        self.input_norms = [RMSNorm(t.rms_norm_eps, dtype=self.dtype,
                                    name=f"input_norm_{i}") for i in range(t.num_hidden_layers)]
        self.post_norms = [RMSNorm(t.rms_norm_eps, dtype=self.dtype,
                                   name=f"post_norm_{i}") for i in range(t.num_hidden_layers)]
        self.attns = [VisionExpertAttention(t, dtype=self.dtype, name=f"attn_{i}")
                      for i in range(t.num_hidden_layers)]
        self.mlps = [VisionExpertMLP(t, dtype=self.dtype, name=f"mlp_{i}")
                     for i in range(t.num_hidden_layers)]
        self.final_norm = RMSNorm(t.rms_norm_eps, dtype=self.dtype)
        self.lm_head = nn.Dense(t.vocab_size, use_bias=False, dtype=self.dtype)

    def __call__(self, input_ids, pixel_values=None, positions=None, *, segment_ids=None):
        cfg = self.config
        is_image = input_ids == cfg.image_token_id
        x = self.embed_tokens(input_ids)
        if pixel_values is not None:
            feats, _ = self.vision_model(pixel_values)
            feats = self.mm_projector(feats[:, 1:])
            flat = feats.reshape(1, -1, feats.shape[-1])
            idx = jnp.clip(jnp.cumsum(is_image.astype(jnp.int32), -1) - 1, 0,
                           flat.shape[1] - 1)
            gathered = jnp.take_along_axis(
                jnp.broadcast_to(flat, (input_ids.shape[0], *flat.shape[1:])),
                idx[:, :, None], axis=1)
            x = jnp.where(is_image[:, :, None], gathered.astype(x.dtype), x)
        b, s = x.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        for norm1, attn, norm2, mlp in zip(self.input_norms, self.attns,
                                           self.post_norms, self.mlps):
            x = x + attn(norm1(x), positions, is_image, segment_ids)
            x = x + mlp(norm2(x), is_image)
        x = self.final_norm(x)
        return self.lm_head(x)


class CogVLMForCausalLM(PretrainedModel):
    config_class = CogVLMConfig
    module_class = CogVLMModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = (v.image_size // v.patch_size) ** 2
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}
