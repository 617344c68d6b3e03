"""NaViT: patch-n-pack variable-resolution ViT.

Rebuild of the reference's NaViT example (ppdiffusers/examples/navit/
navit.py:260-485): images of arbitrary (patch-divisible) resolutions are
flattened to patch sequences, packed together, and attended with an
image-id mask; factorized height/width position embeddings; attention-pool
readout with one query per packed image.

TPU-first: packing happens on the host into STATIC (B, max_seq_len)
buffers (the reference pads to the dynamic batch max — that would
recompile per batch on XLA); the packed mask rides the repo's
segment-id attention (ops.attention SegmentIds, the same machinery the
MixToken text packing uses) instead of a materialized (B,1,N,N) bool
mask; readout returns a static (B, max_images, num_classes) grid plus a
validity mask, flattened on the host."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ...ops.attention import SegmentIds


@dataclasses.dataclass
class NaViTConfig(BaseConfig):
    model_type = "navit"
    image_size: int = 256
    patch_size: int = 32
    num_classes: int = 1000
    dim: int = 1024
    depth: int = 6
    heads: int = 16
    dim_head: int = 64
    mlp_dim: int = 2048
    channels: int = 3
    dropout: float = 0.0
    emb_dropout: float = 0.0
    max_seq_len: int = 2048
    max_images_per_pack: int = 8


# ------------------------------------------------------------ host packing
def image_to_patches(image: np.ndarray, patch_size: int):
    """(H, W, C) -> ((h*w, C*p*p) patches, (h*w, 2) positions)."""
    h, w, c = image.shape
    p = patch_size
    assert h % p == 0 and w % p == 0, \
        f"image dims {(h, w)} must be divisible by patch size {p}"
    ph, pw = h // p, w // p
    patches = image.reshape(ph, p, pw, p, c).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(ph * pw, c * p * p)
    ys, xs = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
    positions = np.stack([ys.ravel(), xs.ravel()], axis=-1)
    return patches.astype(np.float32), positions.astype(np.int32)


def group_images_by_max_seq_len(images: Sequence[np.ndarray], patch_size: int,
                                max_seq_len: int,
                                calc_token_dropout: Optional[Callable] = None
                                ) -> List[List[np.ndarray]]:
    """Greedy first-fit packing (reference navit.py:101-138)."""
    groups, group, seq_len = [], [], 0
    for image in images:
        h, w = image.shape[:2]
        drop = calc_token_dropout(h, w) if calc_token_dropout else 0.0
        n = (h // patch_size) * (w // patch_size)
        n = max(1, int(n * (1 - drop)))
        assert n <= max_seq_len, \
            f"image with {n} patches exceeds max_seq_len {max_seq_len}"
        if seq_len + n > max_seq_len:
            groups.append(group)
            group, seq_len = [], 0
        group.append(image)
        seq_len += n
    if group:
        groups.append(group)
    return groups


def pack_images(batched_images: Sequence[Sequence[np.ndarray]],
                patch_size: int, max_seq_len: int,
                token_dropout_prob: float = 0.0,
                rng: Optional[np.random.Generator] = None):
    """Pack per-row image lists into static buffers.

    Returns dict(patches (B,N,D), positions (B,N,2), image_ids (B,N) with
    -1 padding, num_images (B,)). Mirrors the reference's in-forward packing
    loop (navit.py:368-410) but on the host, with token dropout applied
    here (host RNG) instead of inside the traced function."""
    rng = rng or np.random.default_rng()
    rows = []
    for images in batched_images:
        seqs, poss, ids = [], [], []
        for image_id, image in enumerate(images):
            patches, positions = image_to_patches(image, patch_size)
            if token_dropout_prob > 0.0:
                keep = max(1, int(len(patches) * (1 - token_dropout_prob)))
                idx = rng.permutation(len(patches))[:keep]
                patches, positions = patches[idx], positions[idx]
            seqs.append(patches)
            poss.append(positions)
            ids.append(np.full(len(patches), image_id, np.int32))
        rows.append((np.concatenate(seqs), np.concatenate(poss),
                     np.concatenate(ids)))
    b = len(rows)
    d = rows[0][0].shape[-1]
    patches = np.zeros((b, max_seq_len, d), np.float32)
    positions = np.zeros((b, max_seq_len, 2), np.int32)
    image_ids = np.full((b, max_seq_len), -1, np.int32)
    num_images = np.zeros((b,), np.int32)
    for i, (seq, pos, ids) in enumerate(rows):
        n = len(seq)
        assert n <= max_seq_len, f"row {i}: {n} patches > {max_seq_len}"
        patches[i, :n] = seq
        positions[i, :n] = pos
        image_ids[i, :n] = ids
        num_images[i] = ids.max() + 1 if n else 0
    return {"patches": patches, "positions": positions,
            "image_ids": image_ids, "num_images": num_images}


# ------------------------------------------------------------------ model
class NaViTBlock(nn.Module):
    config: NaViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, segment_ids, deterministic: bool = True):
        cfg = self.config
        b, n, _ = x.shape
        inner = cfg.dim_head * cfg.heads
        h = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, n, cfg.heads, cfg.dim_head)
        att = scaled_dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape),
            segment_ids=SegmentIds(segment_ids, segment_ids))
        x = x + nn.Dense(cfg.dim, use_bias=False, dtype=self.dtype)(
            att.reshape(b, n, inner))
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(cfg.mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = x + nn.Dense(cfg.dim, dtype=self.dtype)(h)
        return x


class NaViTModule(nn.Module):
    config: NaViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches, positions, image_ids, num_images,
                 deterministic: bool = True):
        cfg = self.config
        b, n, _ = patches.shape
        valid = image_ids >= 0
        # patch embedding: LN -> Dense -> LN (reference navit.py:306-310)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_ln_in")(
            patches.astype(self.dtype))
        x = nn.Dense(cfg.dim, dtype=self.dtype, name="patch_proj")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_ln_out")(x)
        # factorized 2-D absolute position embedding
        hmax = cfg.image_size // cfg.patch_size
        pos_h = self.param("pos_embed_height",
                           nn.initializers.normal(1.0), (hmax, cfg.dim))
        pos_w = self.param("pos_embed_width",
                           nn.initializers.normal(1.0), (hmax, cfg.dim))
        x = x + pos_h[positions[..., 0]] + pos_w[positions[..., 1]]
        x = nn.Dropout(cfg.emb_dropout)(x, deterministic=deterministic)
        # packed transformer: pad tokens get segment id 0, images 1.., so
        # pads attend only pads and never leak into image tokens
        seg = jnp.where(valid, image_ids + 1, 0).astype(jnp.int32)
        for i in range(cfg.depth):
            x = NaViTBlock(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, seg, deterministic=deterministic)
        # attention pooling: one learned query per packed image
        mq = cfg.max_images_per_pack
        query = self.param("attn_pool_query",
                           nn.initializers.normal(1.0), (cfg.dim,))
        queries = jnp.broadcast_to(query.astype(self.dtype),
                                   (b, mq, cfg.dim))
        kpool = nn.Dense(cfg.dim, use_bias=False, dtype=self.dtype,
                         name="pool_k")(x)
        vpool = nn.Dense(cfg.dim, use_bias=False, dtype=self.dtype,
                         name="pool_v")(x)
        qid = jnp.arange(mq)[None, :, None]
        pool_mask = (qid == image_ids[:, None, :]) & valid[:, None, :]
        logits = jnp.einsum("bqd,bkd->bqk", queries, kpool).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(cfg.dim))
        logits = jnp.where(pool_mask, logits, -1e30)
        att = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        pooled = jnp.einsum("bqk,bkd->bqd", att, vpool) + queries
        out = nn.LayerNorm(dtype=self.dtype, name="head_ln")(pooled)
        logits = nn.Dense(cfg.num_classes, use_bias=False, dtype=self.dtype,
                          name="head")(out)
        image_valid = jnp.arange(mq)[None, :] < num_images[:, None]
        return logits, image_valid


class NaViTModel(PretrainedModel):
    config_class = NaViTConfig
    module_class = NaViTModule

    @classmethod
    def example_inputs(cls, config):
        n = min(config.max_seq_len, 64)
        return ((jnp.zeros((1, n, config.channels * config.patch_size ** 2)),
                 jnp.zeros((1, n, 2), jnp.int32),
                 jnp.zeros((1, n), jnp.int32),
                 jnp.ones((1,), jnp.int32)), {})

    def classify(self, batched_images, token_dropout_prob: float = 0.0,
                 rng=None):
        """List-of-lists of (H,W,C) numpy images -> list of per-image logits
        rows (host flatten of the static output grid)."""
        packed = pack_images(batched_images, self.config.patch_size,
                             self.config.max_seq_len, token_dropout_prob, rng)
        logits, valid = self(jnp.asarray(packed["patches"]),
                             jnp.asarray(packed["positions"]),
                             jnp.asarray(packed["image_ids"]),
                             jnp.asarray(packed["num_images"]))
        logits, valid = np.asarray(logits), np.asarray(valid)
        return [row[v] for row, v in zip(logits, valid)]
