"""Diffusion embeddings (reference ppdiffusers/ppdiffusers/models/embeddings.py):
sinusoidal timesteps, timestep MLP, label embeddings, patch embed for DiT."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """timesteps: (B,) -> (B, embedding_dim). Matches diffusers semantics."""
    half = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class Timesteps(nn.Module):
    num_channels: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    def __call__(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels, flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
        )


class TimestepEmbedding(nn.Module):
    time_embed_dim: int
    act_fn: str = "silu"
    out_dim: Optional[int] = None  # reference TimestepEmbedding(out_dim=...)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        from ...ops import get_activation

        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = get_activation(self.act_fn)(sample)
        return nn.Dense(self.out_dim or self.time_embed_dim, dtype=self.dtype,
                        name="linear_2")(sample)


class LabelEmbedding(nn.Module):
    """Class labels + CFG dropout (DiT; reference DiT/diffusion/dit.py)."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels, force_drop_ids=None, rng=None):
        use_cfg = self.dropout_prob > 0
        emb = nn.Embed(self.num_classes + (1 if use_cfg else 0), self.hidden_size,
                       dtype=self.dtype, name="embedding_table")
        if force_drop_ids is not None:
            labels = jnp.where(force_drop_ids, self.num_classes, labels)
        elif rng is not None and use_cfg:
            drop = jax.random.bernoulli(rng, self.dropout_prob, labels.shape)
            labels = jnp.where(drop, self.num_classes, labels)
        return emb(labels)


class PatchEmbed2D(nn.Module):
    """DiT/SD3 latent patchify: (B,H,W,C) -> (B, HW/p^2, D) + 2D sincos pos."""

    patch_size: int
    embed_dim: int
    add_pos_embed: bool = True
    base_size: Optional[int] = None  # grid size pos embed was trained at
    interpolation_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent):
        b, h, w, c = latent.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(latent)
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, self.embed_dim)
        if self.add_pos_embed:
            pos = get_2d_sincos_pos_embed(self.embed_dim, gh, gw,
                                          interpolation_scale=self.interpolation_scale,
                                          base_size=self.base_size or gh)
            x = x + pos[None].astype(x.dtype)
        return x


def get_1d_sincos_pos_embed(embed_dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = pos.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def get_2d_sincos_pos_embed(embed_dim: int, gh: int, gw: int,
                            interpolation_scale: float = 1.0, base_size: int = 16) -> jnp.ndarray:
    grid_h = jnp.arange(gh, dtype=jnp.float32) / (gh / base_size) / interpolation_scale
    grid_w = jnp.arange(gw, dtype=jnp.float32) / (gw / base_size) / interpolation_scale
    grid = jnp.meshgrid(grid_w, grid_h)  # w goes first (diffusers convention)
    # MAE quirk kept for checkpoint parity (ref ppdiffusers models/embeddings.py:89-98):
    # the FIRST half of the embedding encodes grid[0] — the W mesh — not H.
    emb_first = get_1d_sincos_pos_embed(embed_dim // 2, grid[0])   # w coordinate
    emb_second = get_1d_sincos_pos_embed(embed_dim // 2, grid[1])  # h coordinate
    return jnp.concatenate([emb_first, emb_second], axis=-1)
