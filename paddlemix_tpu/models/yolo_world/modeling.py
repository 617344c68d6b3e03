"""YOLO-World: open-vocabulary detection (reference
paddlemix/examples/YOLO-World/yolo_world/models/: backbones/
yolo_world_backbone.py, necks/yolo_world_pafpn.py, heads/yolo_world_head.py;
image tower = ppdet YOLOv8 CSPDarknet).

TPU-native: NHWC, frozen-BN folded into affine params (inference semantics,
trainable), text tower = models.clip CLIPTextModelWithProjection, detection
decode (DFL + anchors) and class-wise NMS as static-shape jax ops."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel


class ConvBNAct(nn.Module):
    """Conv + (frozen) BN + SiLU (ppdet BaseConv; BN stats are params so
    checkpoints load them and training treats them as affine)."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + 1e-3).astype(x.dtype)
        x = (x - mean.astype(x.dtype)) * inv * scale.astype(x.dtype) \
            + bias.astype(x.dtype)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBNAct(self.features, 3, dtype=self.dtype, name="conv1")(x)
        h = ConvBNAct(self.features, 3, dtype=self.dtype, name="conv2")(h)
        return x + h if self.shortcut and x.shape[-1] == self.features else h


class C2f(nn.Module):
    """YOLOv8 CSP layer with two convs."""

    features: int
    num_blocks: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = int(self.features * self.expansion)
        h = ConvBNAct(2 * c, 1, dtype=self.dtype, name="conv1")(x)
        parts = list(jnp.split(h, 2, axis=-1))
        for i in range(self.num_blocks):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype,
                                    name=f"bottlenecks_{i}")(parts[-1]))
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="conv2")(jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        x = ConvBNAct(c, 1, dtype=self.dtype, name="conv1")(x)
        outs = [x]
        p = self.pool // 2
        for i in range(3):
            outs.append(nn.max_pool(outs[-1], (self.pool, self.pool),
                                    strides=(1, 1), padding=((p, p), (p, p))))
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="conv2")(jnp.concatenate(outs, axis=-1))


@dataclasses.dataclass
class YOLOWorldConfig(BaseConfig):
    model_type = "yolo-world"
    base_channels: int = 64
    depth_mult: float = 1.0   # v8l defaults
    width_mult: float = 1.0
    last_stage_factor: float = 0.5  # v8l: c5 = 512 (not 1024)
    text_channels: int = 512
    embed_dims: int = 512   # head contrastive embed
    neck_embed_channels: Tuple[int, ...] = (128, 256, 512)
    neck_num_heads: Tuple[int, ...] = (4, 8, 16)
    num_csp_blocks: int = 3
    reg_max: int = 16
    use_bn_head: bool = True
    strides: Tuple[int, ...] = (8, 16, 32)

    def widths(self):
        w = lambda c: int(c * self.width_mult)
        c5 = int(self.base_channels * 16 * self.last_stage_factor)
        return (w(self.base_channels), w(self.base_channels * 2),
                w(self.base_channels * 4), w(self.base_channels * 8), w(c5))

    def depths(self):
        d = lambda n: max(int(round(n * self.depth_mult)), 1)
        return (d(3), d(6), d(6), d(3))


class CSPDarkNetV8(nn.Module):
    config: YOLOWorldConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1, c2, c3, c4, c5 = self.config.widths()
        d1, d2, d3, d4 = self.config.depths()
        x = ConvBNAct(c1, 3, 2, dtype=self.dtype, name="stem")(x)
        x = ConvBNAct(c2, 3, 2, dtype=self.dtype, name="stage1_down")(x)
        x = C2f(c2, d1, dtype=self.dtype, name="stage1_csp")(x)
        x = ConvBNAct(c3, 3, 2, dtype=self.dtype, name="stage2_down")(x)
        x = p3 = C2f(c3, d2, dtype=self.dtype, name="stage2_csp")(x)
        x = ConvBNAct(c4, 3, 2, dtype=self.dtype, name="stage3_down")(x)
        x = p4 = C2f(c4, d3, dtype=self.dtype, name="stage3_csp")(x)
        x = ConvBNAct(c5, 3, 2, dtype=self.dtype, name="stage4_down")(x)
        x = C2f(c5, d4, dtype=self.dtype, name="stage4_csp")(x)
        p5 = SPPF(c5, dtype=self.dtype, name="sppf")(x)
        return p3, p4, p5


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided gating (necks/yolo_world_pafpn.py:25-117): per-head max
    region-text similarity -> sigmoid gate on projected features."""

    features: int
    embed_channels: int
    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        b, h, w, cin = x.shape
        nh = self.num_heads
        hc = self.features // nh
        embed = x
        if self.embed_channels != cin:
            embed = ConvBNAct(self.embed_channels, 3, act=False,
                              dtype=self.dtype, name="embed_conv")(x)
        g = nn.Dense(self.embed_channels, dtype=self.dtype, name="guide_fc")(guide)
        g = g.reshape(b, -1, nh, self.embed_channels // nh)
        e = embed.reshape(b, h * w, nh, self.embed_channels // nh)
        attn = jnp.einsum("bnhc,bkhc->bhnk", e, g)  # (B, nh, HW, K)
        attn = jnp.max(attn, axis=-1) / (self.embed_channels // nh) ** 0.5
        bias = self.param("bias", nn.initializers.zeros, (nh,))
        attn = jax.nn.sigmoid(attn + bias[None, :, None].astype(attn.dtype))
        xp = ConvBNAct(self.features, 3, act=False, dtype=self.dtype,
                       name="project_conv")(x)
        xp = xp.reshape(b, h * w, nh, hc) * attn.transpose(0, 2, 1)[..., None]
        return xp.reshape(b, h, w, self.features)


class MaxSigmoidCSPLayer(nn.Module):
    features: int
    embed_channels: int
    num_heads: int = 1
    num_blocks: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        c = self.features // 2
        h = ConvBNAct(2 * c, 1, dtype=self.dtype, name="conv1")(x)
        parts = list(jnp.split(h, 2, axis=-1))
        for i in range(self.num_blocks):
            parts.append(Bottleneck(c, shortcut=False, dtype=self.dtype,
                                    name=f"bottlenecks_{i}")(parts[-1]))
        parts.append(MaxSigmoidAttnBlock(c, self.embed_channels, self.num_heads,
                                         dtype=self.dtype,
                                         name="attn_block")(parts[-1], guide))
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="conv2")(jnp.concatenate(parts, axis=-1))


def _upsample2(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YOLOWorldPAFPN(nn.Module):
    config: YOLOWorldConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, txt):
        cfg = self.config
        _, _, c3, c4, c5 = cfg.widths()
        nb = max(int(round(cfg.num_csp_blocks * cfg.depth_mult)), 1)
        emb = [int(e * cfg.width_mult) for e in cfg.neck_embed_channels]
        heads = [max(int(h * cfg.width_mult), 1) for h in cfg.neck_num_heads]
        p3, p4, p5 = feats
        f0 = MaxSigmoidCSPLayer(c4, emb[1], heads[1], nb, dtype=self.dtype,
                                name="top_down_0")(
            jnp.concatenate([_upsample2(p5), p4], -1), txt)
        f1 = MaxSigmoidCSPLayer(c3, emb[0], heads[0], nb, dtype=self.dtype,
                                name="top_down_1")(
            jnp.concatenate([_upsample2(f0), p3], -1), txt)
        d1 = ConvBNAct(c3, 3, 2, dtype=self.dtype, name="downsample_0")(f1)
        pan1 = MaxSigmoidCSPLayer(c4, emb[1], heads[1], nb, dtype=self.dtype,
                                  name="bottom_up_0")(
            jnp.concatenate([d1, f0], -1), txt)
        d2 = ConvBNAct(c4, 3, 2, dtype=self.dtype, name="downsample_1")(pan1)
        pan0 = MaxSigmoidCSPLayer(c5, emb[2], heads[2], nb, dtype=self.dtype,
                                  name="bottom_up_1")(
            jnp.concatenate([d2, p5], -1), txt)
        return f1, pan1, pan0


class _ScaleHead(nn.Module):
    """Per-level cls/reg towers + contrastive logits (heads/yolo_world_head.py)."""

    config: YOLOWorldConfig
    reg_channels: int
    cls_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, txt):
        cfg = self.config
        b, h, w, _ = x.shape
        ce = ConvBNAct(self.cls_channels, 3, dtype=self.dtype, name="cls_0")(x)
        ce = ConvBNAct(self.cls_channels, 3, dtype=self.dtype, name="cls_1")(ce)
        ce = nn.Conv(cfg.embed_dims, (1, 1), dtype=self.dtype, name="cls_out")(ce)

        # contrastive logits vs normalized text embeddings
        if cfg.use_bn_head:
            mean = self.param("bn_mean", nn.initializers.zeros, (cfg.embed_dims,))
            var = self.param("bn_var", nn.initializers.ones, (cfg.embed_dims,))
            scale = self.param("bn_scale", nn.initializers.ones, (cfg.embed_dims,))
            bbias = self.param("bn_bias", nn.initializers.zeros, (cfg.embed_dims,))
            inv = jax.lax.rsqrt(var.astype(jnp.float32) + 1e-3).astype(ce.dtype)
            ce = (ce - mean.astype(ce.dtype)) * inv * scale.astype(ce.dtype) \
                + bbias.astype(ce.dtype)
            logit_scale = self.param("logit_scale",
                                     nn.initializers.constant(-1.0), ())
        else:
            ce = ce / (jnp.linalg.norm(ce.astype(jnp.float32), axis=-1,
                                       keepdims=True) + 1e-6).astype(ce.dtype)
            logit_scale = self.param("logit_scale",
                                     nn.initializers.constant(float(np.log(1 / 0.07))),
                                     ())
        bias = self.param("contrast_bias", nn.initializers.zeros, ())
        tw = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(txt.dtype)
        logits = jnp.einsum("bnc,bkc->bnk", ce.reshape(b, h * w, -1), tw)
        logits = logits * jnp.exp(logit_scale) + bias

        rg = ConvBNAct(self.reg_channels, 3, dtype=self.dtype, name="reg_0")(x)
        rg = ConvBNAct(self.reg_channels, 3, dtype=self.dtype, name="reg_1")(rg)
        rg = nn.Conv(4 * cfg.reg_max, (1, 1), dtype=self.dtype, name="reg_out")(rg)
        # DFL: softmax over reg_max bins -> expected distance
        dist = rg.reshape(b, h * w, 4, cfg.reg_max)
        proj = jnp.arange(cfg.reg_max, dtype=jnp.float32)
        dist = jnp.einsum("bnkr,r->bnk",
                          jax.nn.softmax(dist.astype(jnp.float32), axis=-1), proj)
        return logits, dist


class YOLOWorldModule(nn.Module):
    config: YOLOWorldConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = CSPDarkNetV8(cfg, dtype=self.dtype)
        self.neck = YOLOWorldPAFPN(cfg, dtype=self.dtype)
        _, _, c3, c4, c5 = cfg.widths()
        reg_ch = max(16, c3 // 4, cfg.reg_max * 4)
        self.heads = [
            _ScaleHead(cfg, reg_ch, max(c3, cfg.embed_dims), dtype=self.dtype,
                       name=f"head_{i}") for i in range(3)]

    def __call__(self, images, txt_feats):
        """images: (B, H, W, 3) in [0,1]; txt_feats: (B, K, text_channels)
        pre-computed normalized class-text embeddings. Returns per-anchor
        class logits (B, N, K) and xyxy boxes (B, N, 4) in pixels."""
        cfg = self.config
        feats = self.backbone(images)
        feats = self.neck(feats, txt_feats)
        logits_all, boxes_all = [], []
        for lvl, (f, head) in enumerate(zip(feats, self.heads)):
            b, h, w, _ = f.shape
            logits, dist = head(f, txt_feats)
            stride = cfg.strides[lvl]
            ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
            cx = (xs.reshape(-1) + 0.5)
            cy = (ys.reshape(-1) + 0.5)
            x1 = (cx - dist[..., 0]) * stride
            y1 = (cy - dist[..., 1]) * stride
            x2 = (cx + dist[..., 2]) * stride
            y2 = (cy + dist[..., 3]) * stride
            boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
            logits_all.append(logits)
        return jnp.concatenate(logits_all, 1), jnp.concatenate(boxes_all, 1)


class YOLOWorldModel(PretrainedModel):
    config_class = YOLOWorldConfig
    module_class = YOLOWorldModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 64, 64, 3)),
                 jnp.zeros((1, 2, config.text_channels))), {})


def simple_nms(boxes, scores, iou_threshold: float = 0.65, top_k: int = 100):
    """Static-shape class-agnostic NMS: returns (keep_idx, keep_mask) of
    length top_k (padded). boxes (N,4) xyxy, scores (N,)."""
    n = boxes.shape[0]
    top_k = min(top_k, n)
    order = jnp.argsort(-scores)[:top_k]
    b = boxes[order]
    s = scores[order]

    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(b[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(b[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-6)

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & keep & (jnp.arange(top_k) > i)
        return jnp.where(keep[i], keep & ~sup, keep)

    keep = jax.lax.fori_loop(0, top_k, body, jnp.ones((top_k,), bool))
    return order, keep & (s > -jnp.inf)
