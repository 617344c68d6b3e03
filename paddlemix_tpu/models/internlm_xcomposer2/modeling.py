"""InternLM-XComposer2: PLoRA-based composition VLM.

Rebuild of the reference (paddlemix/models/internlm_xcomposer2/modeling.py,
1749 LoC): a llama-family decoder where every linear carries a Partial-LoRA
branch that is ONLY applied at image-token positions (text goes through the
frozen base weights). Here PLoRA is a per-position gate on a LoRA delta —
dense compute + where-select, static shapes."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import apply_rope, rope_cos_sin, scaled_dot_product_attention
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.configuration import LlamaConfig
from ..llama.modeling import RMSNorm


@dataclasses.dataclass
class IXC2Config(BaseConfig):
    model_type = "internlm_xcomposer2"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    image_token_id: int = 32000
    plora_rank: int = 8
    plora_alpha: int = 16

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(self.text_config)


class PLoRALinear(nn.Module):
    """base Dense + LoRA delta gated by a per-position image mask."""

    features: int
    rank: int
    scaling: float
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_image):
        base = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                        name="base")(x)
        a = nn.Dense(self.rank, use_bias=False, dtype=self.dtype, name="lora_a")(x)
        delta = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="lora_b")(a)
        return base + jnp.where(is_image[..., None], delta * self.scaling, 0.0)


class IXC2Layer(nn.Module):
    config: IXC2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, is_image, segment_ids=None):
        t = self.config.text
        r, scaling = self.config.plora_rank, self.config.plora_alpha / self.config.plora_rank
        hd = t.head_dim_
        nh = t.num_attention_heads
        b, s, _ = x.shape
        h = RMSNorm(t.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        q = PLoRALinear(nh * hd, r, scaling, dtype=self.dtype, name="q_proj")(h, is_image)
        k = PLoRALinear(t.kv_heads * hd, r, scaling, dtype=self.dtype, name="k_proj")(h, is_image)
        v = PLoRALinear(t.kv_heads * hd, r, scaling, dtype=self.dtype, name="v_proj")(h, is_image)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, t.kv_heads, hd)
        v = v.reshape(b, s, t.kv_heads, hd)
        cos, sin = rope_cos_sin(positions, hd, t.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        attn = scaled_dot_product_attention(q, k, v, causal=True, segment_ids=segment_ids)
        attn = attn.reshape(b, s, nh * hd)
        x = x + PLoRALinear(t.hidden_size, r, scaling, dtype=self.dtype,
                            name="o_proj")(attn, is_image)
        h = RMSNorm(t.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm")(x)
        gate = PLoRALinear(t.intermediate_size, r, scaling, dtype=self.dtype,
                           name="gate_proj")(h, is_image)
        up = PLoRALinear(t.intermediate_size, r, scaling, dtype=self.dtype,
                         name="up_proj")(h, is_image)
        down = PLoRALinear(t.hidden_size, r, scaling, dtype=self.dtype,
                           name="down_proj")(nn.silu(gate) * up, is_image)
        return x + down


class IXC2Module(nn.Module):
    config: IXC2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        t = cfg.text
        self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.vision_proj = nn.Dense(t.hidden_size, dtype=self.dtype)
        self.embed_tokens = nn.Embed(t.vocab_size, t.hidden_size, dtype=self.dtype)
        self.layers = [IXC2Layer(cfg, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(t.num_hidden_layers)]
        self.norm = RMSNorm(t.rms_norm_eps, dtype=self.dtype)
        self.lm_head = nn.Dense(t.vocab_size, use_bias=False, dtype=self.dtype)

    def __call__(self, input_ids, pixel_values=None, positions=None, *, segment_ids=None):
        cfg = self.config
        is_image = input_ids == cfg.image_token_id
        x = self.embed_tokens(input_ids)
        if pixel_values is not None:
            feats, _ = self.vision_model(pixel_values)
            feats = self.vision_proj(feats[:, 1:])
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
        for layer in self.layers:
            x = layer(x, positions, is_image, segment_ids)
        return self.lm_head(self.norm(x))


class IXC2ForCausalLM(PretrainedModel):
    config_class = IXC2Config
    module_class = IXC2Module

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = (v.image_size // v.patch_size) ** 2
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}
