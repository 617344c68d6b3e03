"""SigLIP vision tower (reference
paddlemix/models/llava/siglip_encoder.py — the LLaVA-NeXT-interleave
vision encoder; architecture per HF transformers SiglipVisionModel).

Differences vs CLIP ViT: no class token, learned per-patch position
embeddings, tanh-approx GELU MLPs, eps=1e-6 layernorms, and a
multi-head attention-pooling (MAP) head instead of CLS pooling. The
LLaVA splice consumes the full patch grid (pre-head hidden states)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import BaseConfig
from ..core.modeling import PretrainedModel
from .layers import MLP, EncoderBlock, MultiHeadAttention, PatchEmbed


@dataclasses.dataclass
class SiglipVisionConfig(BaseConfig):
    model_type = "siglip_vision_model"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    hidden_act: str = "gelu_pytorch_tanh"
    layer_norm_eps: float = 1e-6
    use_head: bool = True


class SiglipMAPHead(nn.Module):
    """Attention-pooling head: a learned probe attends over the patch
    tokens (HF SiglipMultiheadAttentionPoolingHead)."""

    config: SiglipVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        b = hidden.shape[0]
        probe = self.param("probe", nn.initializers.normal(0.02),
                           (1, 1, cfg.hidden_size))
        probe = jnp.broadcast_to(probe, (b, 1, cfg.hidden_size)).astype(
            hidden.dtype)
        x = MultiHeadAttention(num_heads=cfg.num_attention_heads,
                               dtype=self.dtype, name="attn")(probe, hidden)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        x = x + MLP(intermediate_size=cfg.intermediate_size,
                    activation=cfg.hidden_act, dtype=self.dtype,
                    name="mlp")(h)
        return x[:, 0]


class SiglipVisionTransformer(nn.Module):
    config: SiglipVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True,
                 output_hidden_states=False):
        cfg = self.config
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        x = PatchEmbed(cfg.patch_size, cfg.hidden_size, use_bias=True,
                       dtype=self.dtype, name="patch_embed")(pixel_values)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_patches, cfg.hidden_size))
        x = x + pos[None].astype(x.dtype)
        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = EncoderBlock(
                num_heads=cfg.num_attention_heads,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.hidden_act,
                eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
            hidden_states.append(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="post_layernorm")(x)
        pooled = (SiglipMAPHead(cfg, dtype=self.dtype, name="head")(x)
                  if cfg.use_head else x.mean(axis=1))
        if output_hidden_states:
            return x, pooled, tuple(hidden_states)
        return x, pooled


class SiglipVisionModel(PretrainedModel):
    config_class = SiglipVisionConfig
    module_class = SiglipVisionTransformer

    @classmethod
    def example_inputs(cls, config):
        s = config.image_size
        return (jnp.zeros((1, s, s, 3)),), {}

    torch_key_map = (
        (r"^vision_model\.", ""),
        (r"embeddings\.patch_embedding\.", "patch_embed.proj."),
        (r"embeddings\.position_embedding\.weight", "position_embedding"),
        (r"^encoder\.layers\.(\d+)\.", r"layers_\1."),
        (r"\.self_attn\.", ".attn."),
        (r"\.layer_norm1\.", ".norm1."),
        (r"\.layer_norm2\.", ".norm2."),
        (r"head\.attention\.", "head.attn."),
        (r"(norm[^.]*|layernorm)\.weight$", r"\1.scale"),
        (r"\.weight$", ".kernel"),
    )

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        """HF SiglipVisionModel naming -> this module's tree. The MAP head's
        torch MultiheadAttention packs qkv as in_proj_{weight,bias}; unpack
        BEFORE the generic pass so each chunk gets the (out,in)->(in,out)
        transpose."""
        flat = dict(flat)
        for suffix in ("weight", "bias"):
            for key in list(flat):
                if key.endswith(f"attention.in_proj_{suffix}"):
                    packed = flat.pop(key)
                    d = packed.shape[0] // 3
                    base = key[: -len(f"in_proj_{suffix}")]
                    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                        flat[f"{base}{name}.{suffix}"] = packed[i * d:(i + 1) * d]
        from ..core.modeling import convert_torch_state_dict

        return convert_torch_state_dict(flat, cls.torch_key_map)
