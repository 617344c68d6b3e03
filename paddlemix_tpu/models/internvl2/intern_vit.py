"""InternViT vision tower (InternVL2).

Rebuild of the reference
paddlemix/models/internvl2/internvl_chat/modeling_intern_vit.py: conv patch
embed + class token + bicubic-interpolated position embedding (:196-246),
encoder layers with fused qkv attention, optional qk RMS-normalization over
the flattened head dim (:247-325 — False in 2B/8B, True in 26B), LN or RMS
norm_type, learnable layer scales ls1/ls2 (:345-393), final (optional)
layernorm. NHWC/flax; HF checkpoint keys load via InternVLChatModel's
conversion."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class InternVisionConfig(BaseConfig):
    model_type = "intern_vit"
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    qkv_bias: bool = True
    qk_normalization: bool = False  # True for InternViT-6B
    norm_type: str = "layer_norm"   # "rms_norm" for InternViT-6B
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu"
    initializer_factor: float = 0.1


def _norm(cfg: InternVisionConfig, name: str, dtype):
    if cfg.norm_type == "rms_norm":
        return nn.RMSNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name=name)


class InternAttention(nn.Module):
    config: InternVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, n, c = x.shape
        h = cfg.num_attention_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=cfg.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # reference layout: (B, N, 3, H, D) — global [q|k|v] thirds
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cfg.qk_normalization:
            # RMSNorm over the FLATTENED (H*D) dim (reference :288-290)
            q = nn.RMSNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="q_norm")(q.reshape(b, n, c)).reshape(b, n, h, hd)
            k = nn.RMSNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="k_norm")(k.reshape(b, n, c)).reshape(b, n, h, hd)
        out = scaled_dot_product_attention(q, k, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class InternVisionEncoderLayer(nn.Module):
    config: InternVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        c = cfg.hidden_size
        ls1 = self.param("ls1", nn.initializers.constant(cfg.initializer_factor), (c,))
        ls2 = self.param("ls2", nn.initializers.constant(cfg.initializer_factor), (c,))
        h = _norm(cfg, "norm1", self.dtype)(x)
        x = x + InternAttention(cfg, dtype=self.dtype, name="attn")(h) * ls1
        h = _norm(cfg, "norm2", self.dtype)(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + h * ls2


class InternVisionModel(nn.Module):
    """Embeddings + encoder; returns (last_hidden, pooled_cls, hiddens) to
    match the CLIPVisionTransformer surface InternVLChatModule consumes."""

    config: InternVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, output_hidden_states: bool = False):
        cfg = self.config
        p = cfg.patch_size
        c = cfg.hidden_size
        x = nn.Conv(c, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embedding")(pixel_values)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (1, 1, c))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)).astype(x.dtype), x],
                            axis=1)
        n_pos = (cfg.image_size // p) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, n_pos, c))
        x = x + self._interp_pos(pos, gh, gw).astype(x.dtype)
        hiddens = [x]
        for i in range(cfg.num_hidden_layers):
            x = InternVisionEncoderLayer(cfg, dtype=self.dtype,
                                         name=f"layers_{i}")(x)
            hiddens.append(x)
        pooled = x[:, 0]
        return x, pooled, (hiddens if output_hidden_states else None)

    @staticmethod
    def _interp_pos(pos, gh, gw):
        """CLS row kept, patch grid bicubic-resized (reference
        _get_pos_embed, modeling_intern_vit.py:~220)."""
        n = pos.shape[1] - 1
        src = int(round(float(np.sqrt(n))))
        if src * src == n and (src, src) == (gh, gw):
            return pos
        from ..qwen_vl.visual import _bicubic_matrix

        body = pos[0, 1:].reshape(src, src, -1).astype(jnp.float32)
        mh = jnp.asarray(_bicubic_matrix(src, gh))
        mw = jnp.asarray(_bicubic_matrix(src, gw))
        body = jnp.einsum("ts,swd->twd", mh, body)
        body = jnp.einsum("us,tsd->tud", mw, body)
        body = body.reshape(1, gh * gw, -1)
        return jnp.concatenate([pos[:, :1].astype(jnp.float32), body], axis=1)
