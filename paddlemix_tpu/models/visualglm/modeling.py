"""VisualGLM: ViT + Q-Former + GLM decoder.

Rebuild of the reference VisualGLM (paddlemix/models/visualglm/modeling.py,
2059 LoC). The LLM here is a ChatGLM2/3-style GLM decoder (RMSNorm pre-norm,
fused-qkv with bias, multi-query attention, partial rotary on half the head
dims, gated SwiGLU via a single 2x-wide projection). The reference wraps the
legacy ChatGLM-v1 (2D prefix positions); its successors and the official
VisualGLM upgrades use this GLM2 layout. glm_version=1 enables the v1
prefix-LM delta: bidirectional attention over the prompt prefix (causal only
over generated tokens) and the 2D position scheme (absolute positions frozen
at the gmask inside the prefix + per-token block positions after it), each
stream rotating a quarter of the head dims."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import rope_cos_sin, scaled_dot_product_attention
from ...ops.rope import apply_rope_gptj
from ..blip2.modeling import QFormer, QFormerConfig
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.modeling import RMSNorm


@dataclasses.dataclass
class ChatGLMConfig(BaseConfig):
    model_type = "chatglm"
    vocab_size: int = 65024
    hidden_size: int = 4096
    ffn_hidden_size: int = 13696
    num_layers: int = 28
    num_attention_heads: int = 32
    multi_query_group_num: int = 2
    layernorm_epsilon: float = 1e-5
    rope_theta: float = 10000.0
    eos_token_id: int = 2
    glm_version: int = 2  # 1 = legacy prefix-LM ChatGLM (VisualGLM v1)

    @property
    def head_dim_(self):
        return self.hidden_size // self.num_attention_heads


class GLMBlock(nn.Module):
    config: ChatGLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, segment_ids=None, prefix_mask=None,
                 block_positions=None):
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim_
        nh = cfg.num_attention_heads
        kvh = cfg.multi_query_group_num
        h = RMSNorm(cfg.layernorm_epsilon, dtype=self.dtype, name="input_layernorm")(x)
        qkv = nn.Dense(nh * hd + 2 * kvh * hd, use_bias=True, dtype=self.dtype,
                       name="query_key_value")(h)
        q, k, v = jnp.split(qkv, [nh * hd, nh * hd + kvh * hd], axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, kvh, hd)
        v = v.reshape(b, s, kvh, hd)
        # partial rotary: first half of head dims, GPT-J interleaved pairs
        rot = hd // 2
        if cfg.glm_version == 1 and block_positions is not None:
            # v1 2D rope (reference modeling_chatglm RotaryEmbeddings x2):
            # absolute positions rotate the first quarter, block positions
            # the second quarter
            qr = rot // 2
            cos_a, sin_a = rope_cos_sin(positions, qr, cfg.rope_theta)
            cos_b, sin_b = rope_cos_sin(block_positions, qr, cfg.rope_theta)
            cos_a = jnp.repeat(cos_a[..., : qr // 2], 2, axis=-1)
            sin_a = jnp.repeat(sin_a[..., : qr // 2], 2, axis=-1)
            cos_b = jnp.repeat(cos_b[..., : qr // 2], 2, axis=-1)
            sin_b = jnp.repeat(sin_b[..., : qr // 2], 2, axis=-1)
            qa, ka = apply_rope_gptj(q[..., :qr], k[..., :qr], cos_a, sin_a)
            qb, kb = apply_rope_gptj(q[..., qr:rot], k[..., qr:rot], cos_b, sin_b)
            q = jnp.concatenate([qa, qb, q[..., rot:]], axis=-1)
            k = jnp.concatenate([ka, kb, k[..., rot:]], axis=-1)
        else:
            cos, sin = rope_cos_sin(positions, rot, cfg.rope_theta)
            # interleave-duplicate angles for the gptj layout
            cos = jnp.repeat(cos[..., : rot // 2], 2, axis=-1)
            sin = jnp.repeat(sin[..., : rot // 2], 2, axis=-1)
            q_rot, k_rot = apply_rope_gptj(q[..., :rot], k[..., :rot], cos, sin)
            q = jnp.concatenate([q_rot, q[..., rot:]], axis=-1)
            k = jnp.concatenate([k_rot, k[..., rot:]], axis=-1)
        if cfg.glm_version == 1 and prefix_mask is not None:
            # prefix-LM: key j visible when j is in the prefix OR j <= i
            causal = jnp.tril(jnp.ones((s, s), bool))[None]
            visible = causal | prefix_mask[:, None, :].astype(bool)
            bias = jnp.where(visible, 0.0, -1e9).astype(jnp.float32)[:, None]
            attn = scaled_dot_product_attention(q, k, v, bias=bias,
                                                segment_ids=segment_ids)
        else:
            attn = scaled_dot_product_attention(q, k, v, causal=True,
                                                segment_ids=segment_ids)
        x = x + nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                         name="dense")(attn.reshape(b, s, nh * hd))
        h = RMSNorm(cfg.layernorm_epsilon, dtype=self.dtype,
                    name="post_attention_layernorm")(x)
        up = nn.Dense(2 * cfg.ffn_hidden_size, use_bias=False, dtype=self.dtype,
                      name="dense_h_to_4h")(h)
        g, u = jnp.split(up, 2, axis=-1)
        return x + nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                            name="dense_4h_to_h")(nn.silu(g) * u)


class ChatGLMModule(nn.Module):
    config: ChatGLMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype)
        self.layers = [GLMBlock(cfg, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(cfg.num_layers)]
        self.final_layernorm = RMSNorm(cfg.layernorm_epsilon, dtype=self.dtype)
        self.output_layer = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype)

    def embed(self, ids):
        return self.embed_tokens(ids)

    def __call__(self, input_ids=None, positions=None, *, inputs_embeds=None,
                 segment_ids=None, prefix_mask=None):
        """prefix_mask (B, S) 1 = prompt token (glm_version=1 only): enables
        bidirectional prefix attention and derives the v1 2D positions —
        absolute ids frozen at the prefix end, block ids counting generated
        tokens (reference modeling_chatglm get_position_ids)."""
        x = self.embed_tokens(input_ids) if inputs_embeds is None else inputs_embeds
        b, s = x.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        block_positions = None
        if self.config.glm_version == 1 and prefix_mask is not None:
            pm = prefix_mask.astype(jnp.int32)
            prefix_len = pm.sum(axis=1, keepdims=True)
            base = jnp.broadcast_to(jnp.arange(s), (b, s))
            positions = jnp.where(pm > 0, base, prefix_len - 1)
            block_positions = jnp.where(pm > 0, 0, base - prefix_len + 1)
        for layer in self.layers:
            x = layer(x, positions, segment_ids, prefix_mask=prefix_mask,
                      block_positions=block_positions)
        return self.output_layer(self.final_layernorm(x))


@dataclasses.dataclass
class VisualGLMConfig(BaseConfig):
    model_type = "visualglm"
    vision_config: Optional[Dict[str, Any]] = None
    qformer_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    num_query_tokens: int = 32
    image_token_id: int = 65000

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
    def text(self) -> ChatGLMConfig:
        return ChatGLMConfig.from_dict(self.text_config)


class VisualGLMModule(nn.Module):
    config: VisualGLMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.query_tokens = self.param("query_tokens", nn.initializers.normal(0.02),
                                       (1, cfg.num_query_tokens, cfg.qformer.hidden_size))
        self.qformer = QFormer(cfg.qformer, dtype=self.dtype)
        self.glm_proj = nn.Dense(cfg.text.hidden_size, dtype=self.dtype)
        self.language_model = ChatGLMModule(cfg.text, dtype=self.dtype)

    def encode_image(self, pixel_values):
        image_embeds, _ = self.vision_model(pixel_values)
        queries = jnp.broadcast_to(
            self.query_tokens, (pixel_values.shape[0], *self.query_tokens.shape[1:])
        ).astype(self.dtype)
        return self.glm_proj(self.qformer(queries, image_embeds))

    def __call__(self, input_ids, pixel_values=None, positions=None, *, segment_ids=None):
        is_img = input_ids == self.config.image_token_id
        x = self.language_model.embed(input_ids)
        if pixel_values is not None:
            feats = self.encode_image(pixel_values)
            flat = feats.reshape(1, -1, feats.shape[-1])
            idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), -1) - 1, 0,
                           flat.shape[1] - 1)
            gathered = jnp.take_along_axis(
                jnp.broadcast_to(flat, (input_ids.shape[0], *flat.shape[1:])),
                idx[:, :, None], axis=1)
            x = jnp.where(is_img[:, :, None], gathered.astype(x.dtype), x)
        return self.language_model(positions=positions, inputs_embeds=x,
                                   segment_ids=segment_ids)


class ChatGLMForCausalLM(PretrainedModel):
    config_class = ChatGLMConfig
    module_class = ChatGLMModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 4), jnp.int32),), {}


class VisualGLMForConditionalGeneration(PretrainedModel):
    config_class = VisualGLMConfig
    module_class = VisualGLMModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = config.num_query_tokens
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.image_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}
