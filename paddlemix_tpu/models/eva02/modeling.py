"""EVA-02: masked-image-modeling ViT pretraining + finetune classifier.

Rebuild of the reference EVA-02 (paddlemix/models/eva02/modeling_finetune.py,
modeling_pretrain.py): a ViT with EVA's 2D axial rotary position embedding
(reference paddlemix/models/clip/modules/rope.py:98-133
VisionRotaryEmbeddingFast — interleaved-pair rotation, half the head dim per
grid axis), learned absolute position embeddings, SwiGLU MLP with sub-LN
(naiveswiglu + ffn_ln), separate q/k/v projections with NO bias on k
(modeling_finetune.py:184-186), and mean-pooled fc_norm classification head
(use_mean_pooling, modeling_finetune.py:655-656). Pretraining regresses
masked-patch features against a frozen teacher (EVA-CLIP features,
modeling_pretrain.py:371-376); finetune adds a linear classifier."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


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
    qkv_bias: bool = True         # q/v bias; k NEVER has one (reference :185)
    use_abs_pos_emb: bool = True
    use_mean_pooling: bool = True  # finetune head: fc_norm over mean patches
    pt_hw_seq_len: int = 16       # rope pretrain grid (reference pt_hw_seq_len)
    intp_freq: bool = False       # interpolate rope freqs to the ft grid
    num_classes: int = 0          # >0 adds the finetune head
    teacher_dim: int = 512        # MIM regression target dim


def _rotate_half_interleaved(x):
    """EVA rope rotation on interleaved pairs: (x0, x1) -> (-x1, x0)
    (reference clip/modules/rope.py:40-44)."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(x.shape[:-2] + (-1,))


def vision_rope_2d(grid_h, grid_w, head_dim, pt_seq_len=16, intp_freq=False,
                   theta=10000.0):
    """EVA's axial 2D rotary tables (VisionRotaryEmbeddingFast,
    reference clip/modules/rope.py:98-133): the first head_dim/2 lanes rotate
    by the ROW position, the last head_dim/2 by the COLUMN position; each
    axis half uses lang-style freqs over dim/4 bands, repeat-interleaved so
    adjacent lane PAIRS share a frequency. Returns (cos, sin) of shape
    (grid_h*grid_w, head_dim) as float32 numpy (static tables)."""
    dim = head_dim // 2
    freqs = 1.0 / theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float32) / dim)

    def axis(n):
        # reference: t = arange(ft)/ft*pt with ft = grid when intp_freq else
        # pt (grid must equal pt then) — identical to arange(grid) in the
        # non-interpolated well-defined case
        t = (np.arange(n, dtype=np.float32) / n * pt_seq_len
             if intp_freq else np.arange(n, dtype=np.float32))
        f = np.outer(t, freqs)                         # (n, dim//2)
        return np.repeat(f, 2, axis=-1)                # (n, dim)

    fh, fw = axis(grid_h), axis(grid_w)
    full = np.concatenate(
        [np.broadcast_to(fh[:, None, :], (grid_h, grid_w, dim)),
         np.broadcast_to(fw[None, :, :], (grid_h, grid_w, dim))], axis=-1)
    full = full.reshape(grid_h * grid_w, head_dim)
    return np.cos(full), np.sin(full)


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
        q = nn.Dense(d, use_bias=cfg.qkv_bias, dtype=self.dtype,
                     name="q_proj")(h).reshape(b, s, nh, hd)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype,
                     name="k_proj")(h).reshape(b, s, nh, hd)
        v = nn.Dense(d, use_bias=cfg.qkv_bias, dtype=self.dtype,
                     name="v_proj")(h).reshape(b, s, nh, hd)
        if cos is not None:
            # rope on patch tokens only; CLS rows carry (cos=1, sin=0) so the
            # same fused multiply is an identity there (reference
            # modeling_finetune.py:246-253 concats the unrotated CLS slice)
            c = cos[None, :, None, :].astype(q.dtype)
            sn = sin[None, :, None, :].astype(q.dtype)
            q = q * c + _rotate_half_interleaved(q) * sn
            k = k * c + _rotate_half_interleaved(k) * sn
        attn = scaled_dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        # naiveswiglu + sub-LN (reference modeling_finetune.py:111-149)
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
        if cfg.use_abs_pos_emb:  # reference modeling_finetune.py:611-615
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, gh * gw + 1, cfg.hidden_size))
            x = x + pos.astype(x.dtype)
        cos = sin = None
        if cfg.use_rope:
            hd = cfg.hidden_size // cfg.num_attention_heads
            cos, sin = vision_rope_2d(gh, gw, hd, pt_seq_len=cfg.pt_hw_seq_len,
                                      intp_freq=cfg.intp_freq)
            # prepend the CLS identity row (cos=1, sin=0)
            cos = jnp.concatenate([jnp.ones((1, hd), jnp.float32),
                                   jnp.asarray(cos)], axis=0)
            sin = jnp.concatenate([jnp.zeros((1, hd), jnp.float32),
                                   jnp.asarray(sin)], axis=0)
        for i in range(cfg.num_hidden_layers):
            x = EVA02Block(cfg, dtype=self.dtype, name=f"blocks_{i}")(x, cos, sin)
        if cfg.num_classes > 0:
            if cfg.use_mean_pooling:  # reference :655-656, forward_features
                pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                      name="fc_norm")(x[:, 1:].mean(axis=1))
            else:
                pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                      name="norm")(x)[:, 0]
            return nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(pooled)
        # MIM path: final LN then regress patch features
        # (reference modeling_pretrain.py:371-376)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
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
