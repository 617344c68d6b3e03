"""EVA-02: masked-image-modeling ViT pretraining + finetune classifier.

Rebuild of the reference EVA-02 (paddlemix/models/eva02/, 1598 LoC): a ViT
with rotary position embeddings on patch grid + SwiGLU MLP (EVA-02 style);
pretraining regresses masked-patch features against a frozen teacher (the
reference uses EVA-CLIP features); finetune adds a linear classifier."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import apply_rope, rope_cos_sin, scaled_dot_product_attention


@dataclasses.dataclass
class EVA02Config(BaseConfig):
    model_type = "eva02"
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    layer_norm_eps: float = 1e-6
    use_rope: bool = True
    num_classes: int = 0          # >0 adds the finetune head
    teacher_dim: int = 512        # MIM regression target dim


class EVA02Block(nn.Module):
    config: EVA02Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos=None, sin=None):
        cfg = self.config
        d = cfg.hidden_size
        nh = cfg.num_attention_heads
        hd = d // nh
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        b, s = h.shape[:2]
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h).reshape(b, s, nh, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h).reshape(b, s, nh, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h).reshape(b, s, nh, hd)
        if cos is not None:  # rope on patch tokens only (CLS position 0 fixed)
            q, k = apply_rope(q, k, cos, sin)
        attn = scaled_dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        # SwiGLU (EVA-02 signature piece)
        w1 = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="w1")(h)
        w2 = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="w2")(h)
        h = nn.silu(w1) * w2
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ffn_ln")(h)
        return x + nn.Dense(d, dtype=self.dtype, name="w3")(h)


class EVA02Module(nn.Module):
    config: EVA02Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, bool_masked_pos=None):
        """bool_masked_pos: (B, N) True = replace patch with mask token (MIM)."""
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(pixel_values)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        if bool_masked_pos is not None:
            mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                    (cfg.hidden_size,))
            x = jnp.where(bool_masked_pos[:, :, None], mask_token.astype(x.dtype), x)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(x.dtype),
                             x], axis=1)
        cos = sin = None
        if cfg.use_rope:
            hd = cfg.hidden_size // cfg.num_attention_heads
            pos = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.arange(1, gh * gw + 1)])[None]
            cos, sin = rope_cos_sin(jnp.broadcast_to(pos, (b, gh * gw + 1)), hd)
        for i in range(cfg.num_hidden_layers):
            x = EVA02Block(cfg, dtype=self.dtype, name=f"blocks_{i}")(x, cos, sin)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        if cfg.num_classes > 0:
            return nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(x[:, 0])
        return nn.Dense(cfg.teacher_dim, dtype=self.dtype, name="lm_head")(x[:, 1:])


class EVA02Model(PretrainedModel):
    config_class = EVA02Config
    module_class = EVA02Module

    @classmethod
    def example_inputs(cls, config):
        s = config.image_size
        n = (s // config.patch_size) ** 2
        # pass a mask so the MIM mask_token param is created at init
        return (jnp.zeros((1, s, s, 3)),), {
            "bool_masked_pos": jnp.zeros((1, n), bool)}


def mim_loss(pred_features, teacher_features, bool_masked_pos):
    """Cosine regression on masked patches (reference eva02 pretrain loss)."""
    pred = pred_features / jnp.linalg.norm(pred_features, axis=-1, keepdims=True)
    teach = teacher_features / jnp.linalg.norm(teacher_features, axis=-1, keepdims=True)
    cos = jnp.sum(pred * teach, axis=-1)
    mask = bool_masked_pos.astype(jnp.float32)
    return jnp.sum((1.0 - cos) * mask) / jnp.maximum(mask.sum(), 1.0)
