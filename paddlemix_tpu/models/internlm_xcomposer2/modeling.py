"""InternLM-XComposer2: PLoRA-based composition VLM.

Rebuild of the reference (paddlemix/models/internlm_xcomposer2/modeling.py,
1749 LoC): an InternLM2 decoder where every linear carries a Partial-LoRA
branch (`Plora_A`/`Plora_B`, :173-217, lora_r=256 alpha=256) that is ONLY
applied at image-token positions — text goes through the frozen base weights.
Structure follows the checkpoint tree: fused `attention.wqkv` with InternLM2's
grouped [g q-heads | k | v] layout, `attention.wo`, swiglu
`feed_forward.w1/w3/w2`, `attention_norm`/`ffn_norm`, CLIP-L `vit` +
2-layer GELU `vision_proj` (:51-60, :823-876). Here PLoRA is a per-position
gate on a LoRA delta — dense compute + where-select, static shapes."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel, convert_torch_state_dict
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
    plora_rank: int = 256
    plora_alpha: int = 256

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
    """Base linear (kernel at this level, mirroring `PLoRA(nn.Linear)`) plus
    a LoRA delta gated by the per-position image mask (reference :173-217)."""

    features: int
    rank: int
    scaling: float
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_image):
        in_f = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_f, self.features))
        base = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            base = base + self.param("bias", nn.initializers.zeros,
                                     (self.features,)).astype(self.dtype)
        a = nn.Dense(self.rank, use_bias=False, dtype=self.dtype,
                     name="Plora_A")(x)
        delta = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="Plora_B")(a)
        return base + jnp.where(is_image[..., None], delta * self.scaling, 0.0)


class IXC2Attention(nn.Module):
    """InternLM2 attention with PLoRA on wqkv/wo; fused wqkv uses the grouped
    [g q-heads | k | v] per-kv-group layout (reference :390-533)."""

    config: IXC2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, is_image, segment_ids=None):
        cfg = self.config
        t = cfg.text
        r, scaling = cfg.plora_rank, cfg.plora_alpha / cfg.plora_rank
        hd = t.head_dim_
        nh = t.num_attention_heads
        kvh = t.kv_heads
        g = nh // kvh
        b, s, _ = x.shape
        qkv = PLoRALinear((nh + 2 * kvh) * hd, r, scaling, dtype=self.dtype,
                          name="wqkv")(x, is_image)
        qkv = qkv.reshape(b, s, kvh, g + 2, hd)
        q = qkv[:, :, :, :g].reshape(b, s, nh, hd)
        k = qkv[:, :, :, g]
        v = qkv[:, :, :, g + 1]
        cos, sin = rope_cos_sin(positions, hd, t.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        attn = scaled_dot_product_attention(q, k, v, causal=True,
                                            segment_ids=segment_ids)
        attn = attn.reshape(b, s, nh * hd)
        return PLoRALinear(t.hidden_size, r, scaling, dtype=self.dtype,
                           name="wo")(attn, is_image)


class IXC2Layer(nn.Module):
    config: IXC2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, is_image, segment_ids=None):
        cfg = self.config
        t = cfg.text
        r, scaling = cfg.plora_rank, cfg.plora_alpha / cfg.plora_rank
        h = RMSNorm(t.rms_norm_eps, dtype=self.dtype, name="attention_norm")(x)
        x = x + IXC2Attention(cfg, dtype=self.dtype, name="attention")(
            h, positions, is_image, segment_ids)
        h = RMSNorm(t.rms_norm_eps, dtype=self.dtype, name="ffn_norm")(x)
        gate = PLoRALinear(t.intermediate_size, r, scaling, dtype=self.dtype,
                           name="w1")(h, is_image)
        up = PLoRALinear(t.intermediate_size, r, scaling, dtype=self.dtype,
                         name="w3")(h, is_image)
        down = PLoRALinear(t.hidden_size, r, scaling, dtype=self.dtype,
                           name="w2")(nn.silu(gate) * up, is_image)
        return x + down


class IXC2Module(nn.Module):
    config: IXC2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        t = cfg.text
        self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        # build_vision_projector mlp_depth=2 (reference :51-60)
        self.vision_proj_0 = nn.Dense(t.hidden_size, dtype=self.dtype)
        self.vision_proj_1 = nn.Dense(t.hidden_size, dtype=self.dtype)
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
            feats = self.vision_proj_1(
                nn.gelu(self.vision_proj_0(feats[:, 1:]), approximate=False))
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


_IXC2_KEY_MAP = (
    (r"^model\.tok_embeddings\.weight$", r"embed_tokens.embedding"),
    (r"^model\.layers\.(\d+)\.", r"layers_\1."),
    (r"^model\.norm\.weight$", r"norm.scale"),
    (r"^output\.weight$", r"lm_head.kernel"),
    (r"^vision_proj\.0\.", r"vision_proj_0."),
    (r"^vision_proj\.2\.", r"vision_proj_1."),
    (r"^vit\.vision_tower\.vision_model\.", r"vision_model."),
    (r"(attention_norm|ffn_norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class IXC2ForCausalLM(PretrainedModel):
    config_class = IXC2Config
    module_class = IXC2Module
    torch_key_map = _IXC2_KEY_MAP

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        out = {}
        for k, v in flat.items():
            if k.startswith("vit.vision_tower.vision_model."):
                # CLIP-L internals share the llava tower renames
                nk = re.sub(r"\.encoder\.layers\.(\d+)\.", r".layers_\1.", k)
                nk = re.sub(r"\.self_attn\.", r".attn.", nk)
                nk = re.sub(r"\.layer_norm1\.", r".norm1.", nk)
                nk = re.sub(r"\.layer_norm2\.", r".norm2.", nk)
                nk = re.sub(r"\.pre_layrnorm\.", r".pre_layernorm.", nk)
                nk = re.sub(r"\.embeddings\.patch_embedding\.", r".patch_embed.proj.", nk)
                nk = re.sub(r"\.embeddings\.class_embedding$", r".class_embedding", nk)
                nk = re.sub(r"\.embeddings\.position_embedding\.weight$",
                            r".position_embedding", nk)
                out[nk] = v
            else:
                out[k] = v
        return convert_torch_state_dict(out, cls.torch_key_map)

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = (v.image_size // v.patch_size) ** 2
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}
