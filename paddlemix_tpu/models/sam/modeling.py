"""SAM (Segment Anything): image encoder + prompt encoder + mask decoder.

Rebuild of the reference SAM (paddlemix/models/sam/: image_encoder.py,
prompt_encoder.py, mask_decoder.py, modeling.py). TPU notes: windowed
attention stays static-shape via reshape-to-windows; relative position bias is
added as an attention bias (math path — windows are small so flash adds
nothing); everything NHWC."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class SamConfig(BaseConfig):
    model_type = "sam"
    image_size: int = 1024
    patch_size: int = 16
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    out_chans: int = 256
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048


def window_partition(x, window: int):
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(windows, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_bias(rel_pos_param, q_size: int, k_size: int):
    """Interpolated decomposed relative positions (reference image_encoder)."""
    max_rel = 2 * max(q_size, k_size) - 1
    rel = rel_pos_param
    if rel.shape[0] != max_rel:
        rel = jax.image.resize(rel, (max_rel, rel.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[idx.astype(jnp.int32)]


class SamViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int  # 0 = global
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        hw = x.shape[1:3]
        pad_hw = hw
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
        b, h, w, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * self.num_heads, hd), 3, axis=2)
        # decomposed relative position bias
        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd))
        Rh = _rel_pos_bias(rel_h, h, h)  # (h, h, hd)
        Rw = _rel_pos_bias(rel_w, w, w)
        q_r = q.transpose(0, 2, 1, 3).reshape(b, self.num_heads, h, w, hd)
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r.astype(jnp.float32), Rh.astype(jnp.float32))
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r.astype(jnp.float32), Rw.astype(jnp.float32))
        bias = (bias_h[:, :, :, :, :, None] + bias_w[:, :, :, :, None, :]).reshape(
            b, self.num_heads, h * w, h * w) * (hd ** -0.5)
        attn = scaled_dot_product_attention(q, k, v, bias=bias, impl="math")
        x = nn.Dense(c, dtype=self.dtype, name="proj")(attn.reshape(b, h * w, c))
        x = x.reshape(b, h, w, c)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        h2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h2 = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h2)


class SamImageEncoder(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.encoder_embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(pixel_values)
        g = cfg.image_size // p
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, cfg.encoder_embed_dim))
        if pos.shape[1] != x.shape[1]:
            pos = jax.image.resize(pos, (1, x.shape[1], x.shape[2], pos.shape[-1]), "bicubic")
        x = x + pos.astype(x.dtype)
        for i in range(cfg.encoder_depth):
            ws = 0 if i in cfg.encoder_global_attn_indexes else cfg.window_size
            x = SamViTBlock(cfg.encoder_embed_dim, cfg.encoder_num_heads, ws,
                            dtype=self.dtype, name=f"blocks_{i}")(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (channel-last layer norm)
        x = nn.Conv(cfg.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(cfg.out_chans, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln2")(x)


class SamPromptEncoder(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        d = cfg.prompt_embed_dim
        self.pe_gaussian = self.param("positional_encoding_gaussian",
                                      nn.initializers.normal(1.0), (2, d // 2))
        # rows: 0 neg point, 1 pos point, 2 box tl, 3 box br
        self.point_embeddings = self.param("point_embeddings",
                                           nn.initializers.normal(1.0), (4, d))
        self.not_a_point_embed = self.param("not_a_point_embed",
                                            nn.initializers.normal(1.0), (d,))
        self.no_mask_embed = self.param("no_mask_embed",
                                        nn.initializers.normal(1.0), (d,))

    def _pe(self, coords):
        """coords in [0,1]^2 -> (..., d) random Fourier features."""
        c = 2.0 * coords - 1.0
        proj = c @ self.pe_gaussian.astype(jnp.float32) * (2 * np.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def grid_pe(self, size: int):
        xs = (jnp.arange(size) + 0.5) / size
        grid = jnp.stack(jnp.meshgrid(xs, xs, indexing="ij"), axis=-1)  # (H,W,2) y,x
        return self._pe(grid[..., ::-1])

    def __call__(self, points=None, point_labels=None, boxes=None):
        """points: (B, N, 2) normalized xy; labels: (B, N) 1 pos / 0 neg / -1 pad;
        boxes: (B, 2, 2). Returns sparse prompt embeddings (B, T, D)."""
        cfg = self.config
        embeds = []
        if points is not None:
            pe = self._pe(points)
            pos = self.point_embeddings[1]
            neg = self.point_embeddings[0]
            none = self.not_a_point_embed
            lab = point_labels[..., None]
            pe = jnp.where(lab == 1, pe + pos, jnp.where(lab == 0, pe + neg, none))
            embeds.append(pe)
        if boxes is not None:
            pe = self._pe(boxes)  # (B, 2, D)
            pe = pe.at[:, 0].add(self.point_embeddings[2])
            pe = pe.at[:, 1].add(self.point_embeddings[3])
            embeds.append(pe)
        if not embeds:
            return jnp.zeros((1, 0, cfg.prompt_embed_dim))
        return jnp.concatenate(embeds, axis=1).astype(self.dtype)


class TwoWayBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    skip_first_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    def _attn(self, name, q, k, v, downsample=1):
        d = self.dim // downsample
        hd = d // self.num_heads
        b, sq = q.shape[:2]
        sk = k.shape[1]
        qq = nn.Dense(d, dtype=self.dtype, name=f"{name}_q")(q).reshape(b, sq, self.num_heads, hd)
        kk = nn.Dense(d, dtype=self.dtype, name=f"{name}_k")(k).reshape(b, sk, self.num_heads, hd)
        vv = nn.Dense(d, dtype=self.dtype, name=f"{name}_v")(v).reshape(b, sk, self.num_heads, hd)
        o = scaled_dot_product_attention(qq, kk, vv, impl="math").reshape(b, sq, d)
        return nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_out")(o)

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # self attention on tokens
        q = queries if self.skip_first_pe else queries + query_pe
        queries = queries + self._attn("self_attn", q, q, queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)
        # cross: tokens -> image
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self._attn("cross_t2i", q, k, keys, downsample=2)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries)
        # mlp
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(queries)
        queries = queries + nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(nn.relu(h))
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries)
        # cross: image -> tokens
        q = queries + query_pe
        keys = keys + self._attn("cross_i2t", k, q, queries, downsample=2)
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class SamMaskDecoder(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompts):
        cfg = self.config
        d = cfg.prompt_embed_dim
        n_masks = cfg.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (n_masks, d))
        b = sparse_prompts.shape[0]
        tokens = jnp.concatenate([
            jnp.broadcast_to(iou_token, (b, 1, d)),
            jnp.broadcast_to(mask_tokens, (b, n_masks, d)),
            sparse_prompts.astype(self.dtype)], axis=1)

        bb, hh, ww, _ = image_embeddings.shape
        keys = jnp.broadcast_to(image_embeddings.reshape(bb, hh * ww, d),
                                (b, hh * ww, d))
        key_pe = jnp.broadcast_to(image_pe.reshape(1, hh * ww, d), (b, hh * ww, d)).astype(self.dtype)
        queries = tokens
        for i in range(cfg.decoder_depth):
            queries, keys = TwoWayBlock(d, cfg.decoder_num_heads, cfg.decoder_mlp_dim,
                                        skip_first_pe=(i == 0), dtype=self.dtype,
                                        name=f"blocks_{i}")(queries, keys, tokens, key_pe)
        # final token->image attention (inline)
        q = queries + tokens
        k = keys + key_pe
        dd = d // 2
        hd = dd // cfg.decoder_num_heads
        bq, sq = q.shape[:2]
        sk = k.shape[1]
        qq = nn.Dense(dd, dtype=self.dtype, name="final_q")(q).reshape(bq, sq, cfg.decoder_num_heads, hd)
        kk = nn.Dense(dd, dtype=self.dtype, name="final_k")(k).reshape(bq, sk, cfg.decoder_num_heads, hd)
        vv = nn.Dense(dd, dtype=self.dtype, name="final_v")(keys).reshape(bq, sk, cfg.decoder_num_heads, hd)
        from ...ops import scaled_dot_product_attention as _sdpa

        att = _sdpa(qq, kk, vv, impl="math").reshape(bq, sq, dd)
        queries = queries + nn.Dense(d, dtype=self.dtype, name="final_out")(att)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm_final")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1: 1 + n_masks]
        # upscale image embedding 4x with transposed convs
        img = keys.reshape(b, hh, ww, d)
        img = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                               name="upscale_conv1")(img)
        img = nn.LayerNorm(dtype=self.dtype, name="upscale_ln")(img)
        img = nn.gelu(img, approximate=False)
        img = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                               name="upscale_conv2")(img)
        img = nn.gelu(img, approximate=False)
        # per-mask hypernetwork MLPs
        hyper = []
        for i in range(n_masks):
            h = mask_out[:, i]
            h = nn.Dense(d, dtype=self.dtype, name=f"hyper_{i}_fc1")(nn.relu(
                nn.Dense(d, dtype=self.dtype, name=f"hyper_{i}_fc0")(h)))
            h = nn.Dense(d // 8, dtype=self.dtype, name=f"hyper_{i}_fc2")(nn.relu(h))
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)  # (B, n_masks, d//8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, img)
        # iou prediction head
        h = nn.Dense(256, dtype=self.dtype, name="iou_fc1")(iou_out)
        h = nn.Dense(256, dtype=self.dtype, name="iou_fc2")(nn.relu(h))
        iou_pred = nn.Dense(n_masks, dtype=self.dtype, name="iou_fc3")(nn.relu(h))
        return masks, iou_pred


class SamModule(nn.Module):
    config: SamConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = SamImageEncoder(self.config, dtype=self.dtype)
        self.prompt_encoder = SamPromptEncoder(self.config, dtype=self.dtype)
        self.mask_decoder = SamMaskDecoder(self.config, dtype=self.dtype)

    def encode_image(self, pixel_values):
        return self.image_encoder(pixel_values)

    def __call__(self, pixel_values, points=None, point_labels=None, boxes=None):
        embeddings = self.image_encoder(pixel_values)
        sparse = self.prompt_encoder(points, point_labels, boxes)
        grid = self.prompt_encoder.grid_pe(embeddings.shape[1])
        masks, iou = self.mask_decoder(embeddings, grid[None], sparse)
        return masks, iou


class SamModel(PretrainedModel):
    config_class = SamConfig
    module_class = SamModule

    @classmethod
    def example_inputs(cls, config):
        s = config.image_size
        return (jnp.zeros((1, s, s, 3)),), {
            "points": jnp.zeros((1, 1, 2)),
            "point_labels": jnp.ones((1, 1), jnp.int32),
        }
