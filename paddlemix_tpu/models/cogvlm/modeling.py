"""CogVLM / CogAgent: vision-expert attention VLM.

Rebuild of the reference CogVLM (paddlemix/models/cogvlm/modeling.py, 2131
LoC + visual.py 1064): a llama-style decoder where vision-token positions
route through a SEPARATE set of attention/MLP weights (the "vision expert")
while text tokens use the language weights; both share one attention softmax.
Reference semantics carried over exactly:

 - expert masks (modeling.py:115-122): a vision token routes to the vision
   expert only if the NEXT token is also vision — the last token of a span
   (eoi) routes as language;
 - CogVLM position ids (modeling.py:459-476): all interior vision tokens of
   a span share one position (the cumsum increments on language tokens and
   on the first vision token after language);
 - EVA2CLIP tower with POST-norm layers + GLU adapter + boi/eoi (visual.py);
 - CogAgent: a high-res CrossVisionModel (EVA-L encoder + pos embed,
   visual.py:852-866) whose features feed a per-layer CrossAttention
   (modeling.py:296-365) after self-attention.

TPU note: both expert projections run densely and a where() selects per
position — no gather/scatter, fully static (token-dropless expert routing is
bandwidth-cheap at 2 experts)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import apply_rope, rope_cos_sin, scaled_dot_product_attention
from ..clip.eva import EVAVisionConfig, EVAVisionTransformerModule
from ..llama.configuration import LlamaConfig
from ..llama.modeling import RMSNorm
from .visual import EVA2CLIPModel, CogVisionConfig


@dataclasses.dataclass
class CogVLMConfig(BaseConfig):
    model_type = "cogvlm"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    image_token_id: int = 32000
    variant: str = "cogvlm"  # "cogagent" enables the high-res cross branch
    cross_hidden_size: int = 1024
    cross_compute_hidden_size: int = 1024
    cross_image_size: int = 1120
    cross_vision_config: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CogVisionConfig:
        d = dict(self.vision_config)
        if "num_attention_heads" in d:
            d["num_heads"] = d.pop("num_attention_heads")
        return CogVisionConfig.from_dict(d)

    @property
    def cross_vision(self) -> EVAVisionConfig:
        return EVAVisionConfig.from_dict(self.cross_vision_config or {})

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(self.text_config)


def get_expert_mask(is_vision):
    """(B, S) bool -> (vision_mask, language_mask): vision routing requires
    the NEXT token to be vision too (reference modeling.py:115-122)."""
    nxt = jnp.concatenate([is_vision[:, 1:],
                           jnp.zeros_like(is_vision[:, :1])], axis=1)
    vision_mask = is_vision & nxt
    return vision_mask, ~vision_mask


def build_position_ids(is_vision):
    """CogVLM positions: interior vision tokens share one position; the
    counter advances on language tokens and on the first vision token after
    language (reference modeling.py:459-476, with boi/eoi reclassified as
    language first :465-470)."""
    prev = jnp.concatenate([jnp.zeros_like(is_vision[:, :1]),
                            is_vision[:, :-1]], axis=1)
    nxt = jnp.concatenate([is_vision[:, 1:],
                           jnp.zeros_like(is_vision[:, :1])], axis=1)
    # boi = first vision after language (or at seq start); eoi = last vision
    is_boi_eoi = (is_vision & ~prev) | (is_vision & ~nxt)
    tmp_vision = is_vision & ~is_boi_eoi
    prev_v = jnp.concatenate([jnp.zeros_like(tmp_vision[:, :1]),
                              tmp_vision[:, :-1]], axis=1)
    inc = (~tmp_vision) | (tmp_vision & ~prev_v)
    inc = inc.at[:, 0].set(False)
    return jnp.cumsum(inc.astype(jnp.int32), axis=1)


class VisionExpertAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, vision_mask, segment_ids=None):
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim_
        nh = cfg.num_attention_heads

        def proj(name):
            return nn.Dense(nh * hd * 3, use_bias=False, dtype=self.dtype,
                            name=name)(x)

        qkv_vis = proj("vision_expert_query_key_value")
        qkv_lang = proj("language_expert_query_key_value")
        qkv = jnp.where(vision_mask[:, :, None], qkv_vis, qkv_lang)
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * nh, hd), 3, axis=2)
        cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        out = scaled_dot_product_attention(q, k, v, causal=True,
                                           segment_ids=segment_ids)
        out = out.reshape(b, s, nh * hd)
        out_vis = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                           name="vision_expert_dense")(out)
        out_lang = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                            name="language_expert_dense")(out)
        return jnp.where(vision_mask[:, :, None], out_vis, out_lang)


class CrossAttention(nn.Module):
    """CogAgent per-layer cross attention onto the high-res encoder output
    (reference modeling.py:296-365)."""

    config: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_outputs):
        cfg = self.config
        t = cfg.text
        nh = t.num_attention_heads
        cc = cfg.cross_compute_hidden_size
        hd = cc // nh
        b, s, _ = x.shape
        m = encoder_outputs.shape[1]
        q = nn.Dense(cc, use_bias=False, dtype=self.dtype, name="query")(x)
        kv = nn.Dense(2 * cc, use_bias=False, dtype=self.dtype,
                      name="key_value")(encoder_outputs)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, m, nh, hd)
        v = v.reshape(b, m, nh, hd)
        out = scaled_dot_product_attention(q, k, v).reshape(b, s, cc)
        return nn.Dense(t.hidden_size, use_bias=False, dtype=self.dtype,
                        name="dense")(out)


class _SwiGLU(nn.Module):
    hidden_size: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = nn.Dense(self.intermediate_size, use_bias=False,
                        dtype=self.dtype, name="gate_proj")(x)
        up = nn.Dense(self.intermediate_size, use_bias=False,
                      dtype=self.dtype, name="up_proj")(x)
        return nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                        name="down_proj")(nn.silu(gate) * up)


class VisionExpertMLP(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vision_mask):
        cfg = self.config
        vis = _SwiGLU(cfg.hidden_size, cfg.intermediate_size,
                      dtype=self.dtype, name="vision_mlp")(x)
        lang = _SwiGLU(cfg.hidden_size, cfg.intermediate_size,
                       dtype=self.dtype, name="language_mlp")(x)
        return jnp.where(vision_mask[:, :, None], vis, lang)


class CogDecoderLayer(nn.Module):
    config: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, vision_mask, encoder_outputs=None,
                 segment_ids=None):
        cfg = self.config
        t = cfg.text
        h = RMSNorm(t.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        x = x + VisionExpertAttention(t, dtype=self.dtype, name="self_attn")(
            h, positions, vision_mask, segment_ids)
        if cfg.variant == "cogagent" and encoder_outputs is not None:
            h = RMSNorm(t.rms_norm_eps, dtype=self.dtype,
                        name="post_cross_attention_layernorm")(x)
            x = x + CrossAttention(cfg, dtype=self.dtype,
                                   name="cross_attn")(h, encoder_outputs)
        h = RMSNorm(t.rms_norm_eps, dtype=self.dtype,
                    name="post_attention_layernorm")(x)
        return x + VisionExpertMLP(t, dtype=self.dtype, name="mlp")(
            h, vision_mask)


class CogVLMModule(nn.Module):
    config: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        t = cfg.text
        self.vision = EVA2CLIPModel(cfg.vision, out_hidden_size=t.hidden_size,
                                    out_intermediate_size=t.intermediate_size,
                                    variant=cfg.variant, dtype=self.dtype)
        if cfg.variant == "cogagent":
            self.cross_vision = EVAVisionTransformerModule(cfg.cross_vision,
                                                           dtype=self.dtype)
            cv = cfg.cross_vision
            self.cross_pos_embed = self.param(
                "cross_pos_embed", nn.initializers.normal(0.02),
                ((cv.image_size // cv.patch_size) ** 2, cfg.cross_hidden_size))
        self.embed_tokens = nn.Embed(t.vocab_size, t.hidden_size,
                                     dtype=self.dtype)
        self.layers = [CogDecoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(t.num_hidden_layers)]
        self.final_norm = RMSNorm(t.rms_norm_eps, dtype=self.dtype)
        self.lm_head = nn.Dense(t.vocab_size, use_bias=False, dtype=self.dtype)

    def encode_cross_images(self, cross_images):
        feats = self.cross_vision(cross_images, return_all_features=True)
        feats = feats[:, 1:]  # drop CLS
        return feats + self.cross_pos_embed[None].astype(feats.dtype)

    def __call__(self, input_ids, pixel_values=None, positions=None, *,
                 cross_images=None, segment_ids=None):
        cfg = self.config
        is_image = input_ids == cfg.image_token_id
        x = self.embed_tokens(input_ids)
        if pixel_values is not None:
            feats = self.vision(pixel_values)  # (N, patches + 2, D)
            flat = feats.reshape(1, -1, feats.shape[-1])
            idx = jnp.clip(jnp.cumsum(is_image.astype(jnp.int32), -1) - 1, 0,
                           flat.shape[1] - 1)
            gathered = jnp.take_along_axis(
                jnp.broadcast_to(flat, (input_ids.shape[0], *flat.shape[1:])),
                idx[:, :, None], axis=1)
            x = jnp.where(is_image[:, :, None], gathered.astype(x.dtype), x)
        encoder_outputs = None
        if cfg.variant == "cogagent" and cross_images is not None:
            encoder_outputs = self.encode_cross_images(cross_images)
        vision_mask, _ = get_expert_mask(is_image)
        if positions is None:
            positions = build_position_ids(is_image)
        for layer in self.layers:
            x = layer(x, positions, vision_mask, encoder_outputs, segment_ids)
        x = self.final_norm(x)
        return self.lm_head(x)


class CogVLMForCausalLM(PretrainedModel):
    config_class = CogVLMConfig
    module_class = CogVLMModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = (v.image_size // v.patch_size) ** 2 + 2  # boi + patches + eoi
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        kwargs = {}
        if config.variant == "cogagent":
            cs = config.cross_vision.image_size
            kwargs["cross_images"] = jnp.zeros((1, cs, cs, 3))
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), kwargs
