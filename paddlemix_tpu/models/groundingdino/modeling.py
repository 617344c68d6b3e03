"""GroundingDINO: open-set detection = Swin + BERT text + grounded deformable DETR.

Rebuild of the reference (paddlemix/models/groundingdino/modeling.py +
transformer/fuse_modules, 4651 LoC): multi-scale image features and text
features are fused (bi-directional cross attention), a deformable encoder
refines image memory (via ops.ms_deform_attn — the reference's CUDA op),
language-guided query selection picks top-k anchors, and a deformable decoder
predicts grounded boxes + text-alignment logits."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import ms_deform_attn, scaled_dot_product_attention
from ..layers import EncoderBlock, MultiHeadAttention
from .swin import SwinBackbone, SwinConfig


@dataclasses.dataclass
class GroundingDinoConfig(BaseConfig):
    model_type = "groundingdino"
    swin_config: Optional[Dict[str, Any]] = None
    text_vocab_size: int = 30522
    text_hidden_size: int = 256
    text_layers: int = 2
    text_heads: int = 4
    max_text_len: int = 256
    hidden_size: int = 256
    num_heads: int = 8
    num_feature_levels: int = 3
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_queries: int = 900
    num_points: int = 4
    ffn_dim: int = 2048

    def __post_init__(self):
        self.swin_config = self.swin_config or {}

    @property
    def swin(self) -> SwinConfig:
        return SwinConfig.from_dict(self.swin_config)


class BiAttentionFusion(nn.Module):
    """Image<->text bi-directional cross attention (reference fuse_modules.py
    BiMultiHeadAttention)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, txt_mask=None):
        bias = None
        if txt_mask is not None:
            bias = jnp.where(txt_mask[:, None, None, :] > 0, 0.0, -1e9)
        img2 = MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                  name="img2txt")(img, txt, bias=bias)
        txt2 = MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                  name="txt2img")(txt, img)
        gamma_i = self.param("gamma_img", nn.initializers.constant(1e-4),
                             (self.hidden_size,))
        gamma_t = self.param("gamma_txt", nn.initializers.constant(1e-4),
                             (self.hidden_size,))
        return img + gamma_i * img2, txt + gamma_t * txt2


class DeformableEncoderLayer(nn.Module):
    config: GroundingDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, ref_points, shapes, txt, txt_mask):
        cfg = self.config
        d = cfg.hidden_size
        b, s, _ = src.shape
        nh, nl, npnt = cfg.num_heads, len(shapes), cfg.num_points
        # image<->text fusion first (grounded DETR signature step)
        src, txt = BiAttentionFusion(d, cfg.num_heads, dtype=self.dtype,
                                     name="fusion")(src, txt, txt_mask)
        # deformable self attention over multi-scale image memory
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        value = nn.Dense(d, dtype=self.dtype, name="value_proj")(h).reshape(b, s, nh, d // nh)
        offsets = nn.Dense(nh * nl * npnt * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name="sampling_offsets")(h)
        offsets = offsets.reshape(b, s, nh, nl, npnt, 2)
        weights = nn.Dense(nh * nl * npnt, dtype=self.dtype, name="attention_weights")(h)
        weights = jax.nn.softmax(weights.reshape(b, s, nh, nl * npnt), -1).reshape(
            b, s, nh, nl, npnt)
        scale = jnp.asarray([[wd, ht] for ht, wd in shapes], jnp.float32)  # (L, 2) xy
        locs = ref_points[:, :, None, None, None, :] + \
            offsets.astype(jnp.float32) / scale[None, None, None, :, None, :]
        out = ms_deform_attn(value, shapes, locs, weights.astype(jnp.float32))
        src = src + nn.Dense(d, dtype=self.dtype, name="output_proj")(out.astype(self.dtype))
        # ffn
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(src)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(h)
        src = src + nn.Dense(d, dtype=self.dtype, name="fc2")(nn.relu(h))
        return src, txt


class DeformableDecoderLayer(nn.Module):
    config: GroundingDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, memory, ref_points, shapes, txt, txt_mask):
        cfg = self.config
        d = cfg.hidden_size
        b, q, _ = queries.shape
        nh, nl, npnt = cfg.num_heads, len(shapes), cfg.num_points
        # self attention among queries
        h = nn.LayerNorm(dtype=self.dtype, name="norm_sa")(queries)
        queries = queries + MultiHeadAttention(nh, dtype=self.dtype, name="self_attn")(h)
        # text cross attention
        h = nn.LayerNorm(dtype=self.dtype, name="norm_txt")(queries)
        bias = None
        if txt_mask is not None:
            bias = jnp.where(txt_mask[:, None, None, :] > 0, 0.0, -1e9)
        queries = queries + MultiHeadAttention(nh, dtype=self.dtype,
                                               name="text_cross_attn")(h, txt, bias=bias)
        # deformable cross attention into image memory
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ca")(queries)
        s = memory.shape[1]
        value = nn.Dense(d, dtype=self.dtype, name="value_proj")(memory).reshape(
            b, s, nh, d // nh)
        offsets = nn.Dense(nh * nl * npnt * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name="sampling_offsets")(h)
        offsets = offsets.reshape(b, q, nh, nl, npnt, 2)
        weights = nn.Dense(nh * nl * npnt, dtype=self.dtype, name="attention_weights")(h)
        weights = jax.nn.softmax(weights.reshape(b, q, nh, nl * npnt), -1).reshape(
            b, q, nh, nl, npnt)
        scale = jnp.asarray([[wd, ht] for ht, wd in shapes], jnp.float32)
        locs = ref_points[:, :, None, None, None, :2] + \
            offsets.astype(jnp.float32) / scale[None, None, None, :, None, :]
        out = ms_deform_attn(value, shapes, locs, weights.astype(jnp.float32))
        queries = queries + nn.Dense(d, dtype=self.dtype, name="output_proj")(
            out.astype(self.dtype))
        # ffn
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ffn")(queries)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(h)
        return queries + nn.Dense(d, dtype=self.dtype, name="fc2")(nn.relu(h))


class GroundingDinoModule(nn.Module):
    config: GroundingDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, input_ids, text_mask=None):
        cfg = self.config
        d = cfg.hidden_size
        b = pixel_values.shape[0]
        # ---- text encoder (BERT-lite)
        txt = nn.Embed(cfg.text_vocab_size, cfg.text_hidden_size, dtype=self.dtype,
                       name="text_embed")(input_ids)
        pos = self.param("text_pos", nn.initializers.normal(0.02),
                         (cfg.max_text_len, cfg.text_hidden_size))
        txt = txt + pos[None, : txt.shape[1]].astype(txt.dtype)
        for i in range(cfg.text_layers):
            txt = EncoderBlock(cfg.text_heads, 4 * cfg.text_hidden_size,
                               dtype=self.dtype, name=f"text_layer_{i}")(txt)
        txt = nn.Dense(d, dtype=self.dtype, name="feat_map")(txt)  # text -> shared dim

        # ---- image backbone + level projections
        feats = SwinBackbone(cfg.swin, dtype=self.dtype, name="backbone")(pixel_values)
        feats = feats[-cfg.num_feature_levels:]
        shapes = []
        tokens = []
        for li, f in enumerate(feats):
            f = nn.Conv(d, (1, 1), dtype=self.dtype, name=f"input_proj_{li}")(f)
            bb, hh, ww, _ = f.shape
            shapes.append((hh, ww))
            lvl_embed = self.param(f"level_embed_{li}", nn.initializers.normal(0.02), (d,))
            tokens.append(f.reshape(bb, hh * ww, d) + lvl_embed.astype(f.dtype))
        src = jnp.concatenate(tokens, axis=1)

        # reference points: normalized centers per token per level
        refs = []
        for hh, ww in shapes:
            ys = (jnp.arange(hh) + 0.5) / hh
            xs = (jnp.arange(ww) + 0.5) / ww
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        ref_points = jnp.broadcast_to(jnp.concatenate(refs, 0)[None], (b, src.shape[1], 2))

        # ---- encoder (fusion + deformable)
        for i in range(cfg.num_encoder_layers):
            src, txt = DeformableEncoderLayer(cfg, dtype=self.dtype,
                                              name=f"enc_{i}")(src, ref_points, shapes,
                                                               txt, text_mask)

        # ---- language-guided query selection (top-k by max text similarity)
        sim = jnp.einsum("bsd,btd->bst", src, txt)
        if text_mask is not None:
            sim = jnp.where(text_mask[:, None, :] > 0, sim, -1e9)
        score = sim.max(-1)
        k = min(cfg.num_queries, src.shape[1])
        topk = jax.lax.top_k(score, k)[1]  # (B, k)
        sel = jnp.take_along_axis(src, topk[..., None], axis=1)
        sel_refs = jnp.take_along_axis(ref_points, topk[..., None], axis=1)
        queries = nn.Dense(d, dtype=self.dtype, name="query_proj")(sel)
        # anchor boxes (cx, cy, w, h) from selected refs
        wh0 = jax.nn.sigmoid(self.param("anchor_wh", nn.initializers.zeros, (2,)))
        boxes = jnp.concatenate([sel_refs,
                                 jnp.broadcast_to(wh0, sel_refs.shape)], axis=-1)

        # ---- decoder
        for i in range(cfg.num_decoder_layers):
            queries = DeformableDecoderLayer(cfg, dtype=self.dtype,
                                             name=f"dec_{i}")(queries, src, boxes,
                                                              shapes, txt, text_mask)
            delta = nn.Dense(4, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                             name=f"box_head_{i}")(queries)
            boxes = jax.nn.sigmoid(jax.scipy.special.logit(
                jnp.clip(boxes, 1e-4, 1 - 1e-4)) + delta.astype(jnp.float32))

        # grounded classification: query-text alignment logits
        logits = jnp.einsum("bqd,btd->bqt", queries, txt)
        if text_mask is not None:
            logits = jnp.where(text_mask[:, None, :] > 0, logits, -1e9)
        return {"pred_boxes": boxes, "pred_logits": logits, "queries": queries}


class GroundingDinoModel(PretrainedModel):
    config_class = GroundingDinoConfig
    module_class = GroundingDinoModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 8), jnp.int32)), {}

    def predict(self, pixel_values, input_ids, text_mask=None, box_threshold=0.3):
        out = self(pixel_values, input_ids, text_mask)
        scores = jax.nn.sigmoid(out["pred_logits"]).max(-1)
        return out["pred_boxes"], scores
