"""EVA ViT + EVA-CLIP, TPU-native.

Rebuild of the reference EVA vision tower
(paddlemix/models/clip/vit_model.py EVAVisionTransformer:605, Attention:185,
Block:361, SwiGLU:128; modules/rope.py VisionRotaryEmbeddingFast) and the
EVA-CLIP dual-tower model (clip/eva_clip_model.py EVACLIP:177). The EVA
specifics the plain CLIP ViT lacks — separate q/k/v with a BIAS-LESS k_proj,
interleaved 2-D rotary embeddings on the patch grid (CLS skipped, pt->ft freq
interpolation), sub-LN (inner_attn_ln + ffn_ln), SwiGLU MLP (w1/w2/w3),
post-norm block variant, and layer-scale gammas — are all here, so real
EVA-CLIP checkpoints map through the torch key map.

TPU notes: rope cos/sin are precomputed (N, head_dim) constants folded into
the jitted forward; attention routes through ops.scaled_dot_product_attention
(Pallas flash on TPU)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ..layers import PatchEmbed
from .configuration import CLIPTextConfig
from .modeling import CLIPTextTransformer, clip_contrastive_loss


def vision_rope_2d(grid: int, head_dim: int, pt_seq_len: int = 16,
                   intp_freq: bool = True, theta: float = 10000.0):
    """Interleaved 2-D rope tables (reference modules/rope.py
    VisionRotaryEmbeddingFast): rows drive the first half of head_dim, columns
    the second, each frequency repeated twice for the pairwise rotation.
    Returns (grid*grid, head_dim) float32 cos/sin."""
    dim = head_dim // 2
    freqs = 1.0 / theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim)
    t = (np.arange(grid) / grid * pt_seq_len) if intp_freq else np.arange(grid)
    band = np.repeat(np.outer(t, freqs), 2, axis=-1)              # (g, dim)
    fh = np.broadcast_to(band[:, None, :], (grid, grid, dim))     # rows
    fw = np.broadcast_to(band[None, :, :], (grid, grid, dim))     # cols
    full = np.concatenate([fh, fw], axis=-1).reshape(grid * grid, head_dim)
    return (jnp.asarray(np.cos(full), jnp.float32),
            jnp.asarray(np.sin(full), jnp.float32))


def _rotate_interleaved(x):
    """(..., 2k) -> pairs (x0, x1) become (-x1, x0) (reference rope.py
    rotate_half — interleaved, unlike the LLM half-split rotation)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(*x.shape)


def apply_vision_rope(x, cos, sin):
    """x: (B, N, H, D); cos/sin: (N, D)."""
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_interleaved(xf) * s).astype(x.dtype)


@dataclasses.dataclass
class EVAVisionConfig(BaseConfig):
    model_type = "evavision_transformer"
    image_size: int = 224
    patch_size: int = 14
    width: int = 768
    layers: int = 12
    head_width: int = 64
    mlp_ratio: float = 2.6667
    output_dim: int = 512
    qkv_bias: bool = True          # q/v biased; k NEVER has a bias
    use_abs_pos_emb: bool = True
    rope: bool = True
    pt_hw_seq_len: int = 16
    intp_freq: bool = True
    naiveswiglu: bool = True
    subln: bool = True
    inner_attn_ln: bool = True
    postnorm: bool = False
    init_values: Optional[float] = None  # layer-scale gamma init
    use_mean_pooling: bool = False
    layer_norm_eps: float = 1e-6

    @property
    def num_heads(self) -> int:
        return self.width // self.head_width


class EVABlock(nn.Module):
    config: EVAVisionConfig
    dtype: jnp.dtype = jnp.float32

    def _attn(self, x, cos, sin):
        cfg = self.config
        nh, hd = cfg.num_heads, cfg.head_width
        b, n = x.shape[:2]
        q = nn.Dense(nh * hd, use_bias=cfg.qkv_bias, dtype=self.dtype,
                     name="q_proj")(x).reshape(b, n, nh, hd)
        k = nn.Dense(nh * hd, use_bias=False, dtype=self.dtype,
                     name="k_proj")(x).reshape(b, n, nh, hd)
        v = nn.Dense(nh * hd, use_bias=cfg.qkv_bias, dtype=self.dtype,
                     name="v_proj")(x).reshape(b, n, nh, hd)
        if cos is not None:
            # rope on patch tokens only; CLS (position 0) is left unrotated
            q = jnp.concatenate([q[:, :1], apply_vision_rope(q[:, 1:], cos, sin)], 1)
            k = jnp.concatenate([k[:, :1], apply_vision_rope(k[:, 1:], cos, sin)], 1)
        out = scaled_dot_product_attention(q, k, v).reshape(b, n, nh * hd)
        if cfg.subln and cfg.inner_attn_ln:
            out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name="inner_attn_ln")(out)
        return nn.Dense(cfg.width, dtype=self.dtype, name="proj")(out)

    def _mlp(self, x):
        cfg = self.config
        hidden = int(cfg.width * cfg.mlp_ratio)
        if cfg.naiveswiglu:
            x1 = nn.Dense(hidden, dtype=self.dtype, name="w1")(x)
            x2 = nn.Dense(hidden, dtype=self.dtype, name="w2")(x)
            h = nn.silu(x1) * x2
            if cfg.subln:
                h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                 name="ffn_ln")(h)
            return nn.Dense(cfg.width, dtype=self.dtype, name="w3")(h)
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(cfg.width, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))

    @nn.compact
    def __call__(self, x, cos=None, sin=None):
        cfg = self.config
        norm1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm2")
        g1 = g2 = None
        if cfg.init_values is not None and cfg.init_values > 0:
            g1 = self.param("gamma_1", nn.initializers.constant(cfg.init_values),
                            (cfg.width,))
            g2 = self.param("gamma_2", nn.initializers.constant(cfg.init_values),
                            (cfg.width,))

        if cfg.postnorm:
            a = norm1(self._attn(x, cos, sin))
        else:
            a = self._attn(norm1(x), cos, sin)
        x = x + (a if g1 is None else g1.astype(a.dtype) * a)
        if cfg.postnorm:
            m = norm2(self._mlp(x))
        else:
            m = self._mlp(norm2(x))
        return x + (m if g2 is None else g2.astype(m.dtype) * m)


class EVAVisionTransformerModule(nn.Module):
    config: EVAVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, return_all_features: bool = False):
        cfg = self.config
        p = cfg.patch_size
        grid = cfg.image_size // p
        x = PatchEmbed(p, cfg.width, dtype=self.dtype,
                       name="patch_embed")(pixel_values)  # (B, N, C)
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.width)).astype(x.dtype),
                             x], axis=1)
        if cfg.use_abs_pos_emb:
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, grid * grid + 1, cfg.width))
            x = x + pos.astype(x.dtype)
        cos = sin = None
        if cfg.rope:
            cos, sin = vision_rope_2d(grid, cfg.head_width, cfg.pt_hw_seq_len,
                                      cfg.intp_freq)
        for i in range(cfg.layers):
            x = EVABlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x, cos, sin)
        if return_all_features:
            return x
        if cfg.use_mean_pooling:
            pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                  name="fc_norm")(x.mean(axis=1))
        else:
            pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                  name="norm")(x)[:, 0]
        if cfg.output_dim > 0:
            pooled = nn.Dense(cfg.output_dim, dtype=self.dtype, name="head")(pooled)
        return pooled


# EVA checkpoints (paddle/torch): blocks.N.attn.q_proj..., mlp.w1...
_EVA_VISION_KEY_MAP = (
    (r"^visual\.", r""),
    (r"^blocks\.(\d+)\.", r"blocks_\1."),
    (r"\.attn\.", r"."),
    (r"\.mlp\.", r"."),
    (r"(norm[^.]*|ffn_ln|inner_attn_ln|fc_norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class EVAVisionTransformer(PretrainedModel):
    config_class = EVAVisionConfig
    module_class = EVAVisionTransformerModule
    torch_key_map = _EVA_VISION_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        s = config.image_size
        return (jnp.zeros((1, s, s, 3)),), {}


@dataclasses.dataclass
class EVACLIPConfig(BaseConfig):
    model_type = "evaclip"
    vision_cfg: Optional[Dict[str, Any]] = None
    text_cfg: Optional[Dict[str, Any]] = None
    embed_dim: int = 512
    logit_scale_init_value: float = 2.6592

    def __post_init__(self):
        self.vision_cfg = self.vision_cfg or {}
        self.text_cfg = self.text_cfg or {}

    @property
    def vision(self) -> EVAVisionConfig:
        return EVAVisionConfig.from_dict(dict(self.vision_cfg,
                                              output_dim=self.embed_dim))

    @property
    def text(self) -> CLIPTextConfig:
        return CLIPTextConfig.from_dict(dict(self.text_cfg,
                                             projection_dim=self.embed_dim))


class EVACLIPModule(nn.Module):
    config: EVACLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.visual = EVAVisionTransformerModule(cfg.vision, dtype=self.dtype)
        self.text_model = CLIPTextTransformer(cfg.text, dtype=self.dtype)
        self.text_projection = nn.Dense(cfg.embed_dim, use_bias=False,
                                        dtype=self.dtype)
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(
                                          cfg.logit_scale_init_value), ())

    def encode_image(self, pixel_values):
        feats = self.visual(pixel_values)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def encode_text(self, input_ids):
        _, pooled = self.text_model(input_ids)
        feats = self.text_projection(pooled)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, pixel_values, input_ids, axis_name: Optional[str] = None):
        img = self.encode_image(pixel_values)
        txt = self.encode_text(input_ids)
        scale = jnp.exp(self.logit_scale)
        loss = clip_contrastive_loss(img, txt, scale, axis_name=axis_name)
        return {"image_features": img, "text_features": txt,
                "logit_scale": scale, "loss": loss}


class EVACLIP(PretrainedModel):
    """Reference eva_clip_model.py EVACLIP: EVA ViT + CLIP text tower with the
    distributed contrastive loss (all_gather inside pjit)."""

    config_class = EVACLIPConfig
    module_class = EVACLIPModule

    @classmethod
    def example_inputs(cls, config):
        s = config.vision.image_size
        return (jnp.zeros((2, s, s, 3)), jnp.zeros((2, 8), jnp.int32)), {}

    def encode_image(self, pixel_values):
        return self.module.apply({"params": self.params}, pixel_values,
                                 method=self.module.encode_image)

    def encode_text(self, input_ids):
        return self.module.apply({"params": self.params}, input_ids,
                                 method=self.module.encode_text)
