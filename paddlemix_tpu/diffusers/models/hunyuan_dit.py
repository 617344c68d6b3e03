"""HunyuanDiT: bilingual text-to-image DiT.

Rebuild of the reference's HunyuanDiT example model
(ppdiffusers/examples/HunyuanDiT/hydit/modules/models.py:31-400 +
posemb_layers.py get_2d_rotary_pos_embed, poolers.py AttentionPool):
dual text streams (CLIP states + T5 states through an upcast MLP,
masked-merged against a learned padding table), a global conditioning
vector c = t_emb + MLP([T5-attention-pool, 6x256 image-meta sinusoids,
style embedding]), and a U-shaped stack of DiT blocks — self-attention
with 2-D rotary position embedding and QK RMS-norm, shift-only
modulation, cross-attention to the merged text states, and
skip-norm+linear fusion on the decoder half. Final layer is adaLN
shift/scale + per-patch linear.

TPU-first: NHWC latents, patchify via reshape+matmul, rotary tables
precomputed once per resolution as (cos, sin) arrays threaded through the
jitted forward (static shapes), fp32 softmax/norm islands inside a bf16
trunk."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class HunyuanDiTConfig(BaseConfig):
    model_type = "hunyuan_dit"
    sample_size: int = 32          # latent grid (e.g. 128 for 1024px)
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    text_states_dim: int = 1024    # CLIP hidden
    text_states_dim_t5: int = 2048
    text_len: int = 77
    text_len_t5: int = 256
    learn_sigma: bool = True
    norm: str = "layer"

    def __post_init__(self):
        # the reference's skip bookkeeping (append layer < depth//2-1, pop
        # layer > depth//2) balances only for even depth (28/40 in hydit)
        if self.depth % 2:
            raise ValueError(f"HunyuanDiT depth must be even, got {self.depth}")

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32).reshape(-1)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def get_2d_rotary_pos_embed(head_dim: int, height: int, width: int,
                            base_size: Optional[int] = None):
    """(H*W, head_dim//2) cos/sin tables: half the head encodes the row
    coordinate, half the column (reference posemb_layers.py:141-176, with
    the resize-and-crop remap onto the training base grid when the target
    aspect differs)."""
    if base_size is None:
        ys = np.arange(height, dtype=np.float32)
        xs = np.arange(width, dtype=np.float32)
    else:
        # reference get_fill_resize_and_crop: scale the larger factor
        ratio = max(height / base_size, width / base_size)
        ys = np.arange(height, dtype=np.float32) / ratio
        xs = np.arange(width, dtype=np.float32) / ratio
    grid_y, grid_x = np.meshgrid(ys, xs, indexing="ij")
    quarter = head_dim // 4
    freqs = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float32) / quarter))
    ang_y = grid_y.reshape(-1)[:, None] * freqs[None]  # (HW, d/4)
    ang_x = grid_x.reshape(-1)[:, None] * freqs[None]
    ang = np.concatenate([ang_y, ang_x], axis=1)       # (HW, d/2)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def apply_rotary(x, cos, sin):
    """x (B, N, H, D); cos/sin (N, D//2) — interleaved pair rotation."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class QKNorm(nn.Module):
    """Per-head RMS norm on q/k (qk_norm=True, arXiv:2302.05442)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        y = x.astype(jnp.float32)
        y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y), -1, keepdims=True)
                              + 1e-6)
        return (y * scale).astype(x.dtype)


class HunyuanSelfAttention(nn.Module):
    config: HunyuanDiTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rope):
        cfg = self.config
        b, n, d = x.shape
        hd = d // cfg.num_heads
        qkv = nn.Dense(d * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = QKNorm(name="q_norm")(q.reshape(b, n, cfg.num_heads, hd))
        k = QKNorm(name="k_norm")(k.reshape(b, n, cfg.num_heads, hd))
        v = v.reshape(b, n, cfg.num_heads, hd)
        cos, sin = rope
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        out = scaled_dot_product_attention(q, k, v)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(
            out.reshape(b, n, d))


class HunyuanCrossAttention(nn.Module):
    config: HunyuanDiTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, text_states):
        cfg = self.config
        b, n, d = x.shape
        hd = d // cfg.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        kv = nn.Dense(d * 2, dtype=self.dtype, name="kv_proj")(
            text_states.astype(self.dtype))
        k, v = jnp.split(kv, 2, axis=-1)
        m = k.shape[1]
        q = QKNorm(name="q_norm")(q.reshape(b, n, cfg.num_heads, hd))
        k = QKNorm(name="k_norm")(k.reshape(b, m, cfg.num_heads, hd))
        v = v.reshape(b, m, cfg.num_heads, hd)
        out = scaled_dot_product_attention(q, k, v)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(
            out.reshape(b, n, d))


class HunyuanDiTBlock(nn.Module):
    """reference HunYuanDiTBlock (models.py:31-119): shift-only modulation
    self-attn -> cross-attn -> MLP, with skip-norm+linear on decoder half."""

    config: HunyuanDiTConfig
    skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, text_states, rope, skip=None):
        cfg = self.config
        d = cfg.hidden_size
        if self.skip:
            cat = jnp.concatenate([x, skip], axis=-1)
            cat = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                               name="skip_norm")(cat.astype(jnp.float32))
            x = nn.Dense(d, dtype=self.dtype, name="skip_linear")(
                cat.astype(self.dtype))
        shift = nn.Dense(d, dtype=self.dtype, name="modulation",
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros)(
            nn.silu(c.astype(jnp.float32)).astype(self.dtype))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = x + HunyuanSelfAttention(cfg, dtype=self.dtype, name="attn1")(
            h + shift[:, None], rope)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm3")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = x + HunyuanCrossAttention(cfg, dtype=self.dtype, name="attn2")(
            h, text_states)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(int(d * cfg.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        x = x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x


class AttentionPool(nn.Module):
    """CLIP-style attention pooling over T5 states
    (reference poolers.py:5-40)."""

    num_heads: int = 8
    output_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        pos = self.param("positional_embedding",
                         nn.initializers.normal(1.0 / math.sqrt(d)),
                         (n + 1, d))
        x = x.astype(jnp.float32)
        mean = x.mean(axis=1, keepdims=True)
        seq = jnp.concatenate([mean, x], axis=1) + pos[None]
        q = nn.Dense(d, name="q_proj")(seq[:, :1])
        k = nn.Dense(d, name="k_proj")(seq)
        v = nn.Dense(d, name="v_proj")(seq)
        hd = d // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd)
        k = k.reshape(b, n + 1, self.num_heads, hd)
        v = v.reshape(b, n + 1, self.num_heads, hd)
        att = scaled_dot_product_attention(q, k, v, impl="math")
        out = nn.Dense(self.output_dim, name="c_proj")(
            att.reshape(b, 1, d))[:, 0]
        return out.astype(self.dtype)


class HunyuanDiTModule(nn.Module):
    config: HunyuanDiTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, encoder_hidden_states, text_embedding_mask,
                 encoder_hidden_states_t5, text_embedding_mask_t5,
                 image_meta_size=None, style=None, rope=None):
        cfg = self.config
        d = cfg.hidden_size
        b, hh, ww, cch = x.shape
        p = cfg.patch_size
        ph, pw = hh // p, ww // p

        # merged text states: CLIP ++ mlp_t5(T5), masked to a learned pad row
        t5 = encoder_hidden_states_t5.astype(jnp.float32)
        t5 = nn.Dense(cfg.text_states_dim_t5 * 4, name="mlp_t5_fc1")(t5)
        t5 = nn.silu(t5)
        t5 = nn.Dense(cfg.text_states_dim, name="mlp_t5_fc2")(t5)
        text = jnp.concatenate(
            [encoder_hidden_states.astype(jnp.float32), t5], axis=1)
        mask = jnp.concatenate([text_embedding_mask,
                                text_embedding_mask_t5], axis=1)
        pad_table = self.param("text_embedding_padding",
                               nn.initializers.normal(1.0),
                               (cfg.text_len + cfg.text_len_t5,
                                cfg.text_states_dim))
        text = jnp.where(mask[..., None].astype(bool), text, pad_table[None])

        # conditioning vector
        temb = timestep_embedding(t, 256)
        temb = nn.Dense(d, name="t_fc1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(d, name="t_fc2")(temb)
        pooled = AttentionPool(output_dim=1024, dtype=jnp.float32,
                               name="pooler")(
            encoder_hidden_states_t5.astype(jnp.float32))
        if image_meta_size is None:
            image_meta_size = jnp.zeros((b, 6), jnp.float32)
        meta = timestep_embedding(image_meta_size.reshape(-1), 256)
        meta = meta.reshape(b, 6 * 256)
        if style is None:
            style = jnp.zeros((b,), jnp.int32)
        style_emb = nn.Embed(1, d, name="style_embedder")(style)
        extra = jnp.concatenate([pooled, meta, style_emb.astype(jnp.float32)],
                                axis=1)
        extra = nn.Dense(d * 4, name="extra_fc1")(extra)
        extra = nn.silu(extra)
        extra = nn.Dense(d, name="extra_fc2")(extra)
        c = (temb + extra).astype(self.dtype)

        # patchify
        patches = x.reshape(b, ph, p, pw, p, cch).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, ph * pw, p * p * cch)
        seq = nn.Dense(d, dtype=self.dtype, name="x_embedder")(
            patches.astype(self.dtype))

        if rope is None:
            rope = get_2d_rotary_pos_embed(d // cfg.num_heads, ph, pw)
        text = text.astype(self.dtype)

        skips = []
        for layer in range(cfg.depth):
            block = HunyuanDiTBlock(cfg, skip=layer > cfg.depth // 2,
                                    dtype=self.dtype, name=f"block_{layer}")
            if layer > cfg.depth // 2:
                seq = block(seq, c, text, rope, skips.pop())
            else:
                seq = block(seq, c, text, rope)
            if layer < cfg.depth // 2 - 1:
                skips.append(seq)

        # final layer: adaLN shift/scale + linear (models.py:121-139)
        mod = nn.Dense(2 * d, dtype=jnp.float32, name="final_adaLN")(
            nn.silu(c.astype(jnp.float32)))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32, name="norm_final")(
            seq.astype(jnp.float32))
        h = h * (1 + scale[:, None]) + shift[:, None]
        out = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype,
                       name="final_linear")(h.astype(self.dtype))
        out = out.reshape(b, ph, pw, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hh, ww, cfg.out_channels)
        return out


class HunyuanDiTModel(PretrainedModel):
    config_class = HunyuanDiTConfig
    module_class = HunyuanDiTModule

    @classmethod
    def example_inputs(cls, config):
        cfg = config
        s = min(cfg.sample_size, 16)
        return ((jnp.zeros((1, s, s, cfg.in_channels)), jnp.zeros((1,)),
                 jnp.zeros((1, cfg.text_len, cfg.text_states_dim)),
                 jnp.ones((1, cfg.text_len), jnp.int32),
                 jnp.zeros((1, cfg.text_len_t5, cfg.text_states_dim_t5)),
                 jnp.ones((1, cfg.text_len_t5), jnp.int32)), {})
