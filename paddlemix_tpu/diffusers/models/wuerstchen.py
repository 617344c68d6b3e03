"""Wuerstchen stage-C prior, stage-B DiffNeXt decoder, and Paella VQGAN.

Rebuild of the reference pipelines/wuerstchen/modeling_wuerstchen_prior.py,
modeling_wuerstchen_diffnext.py, modeling_wuerstchen_common.py and
modeling_paella_vq_model.py — in NHWC, so the reference's
WuerstchenLayerNorm (an NCHW<->NHWC transpose sandwich around LayerNorm,
modeling_wuerstchen_common.py:24-31) collapses to a plain last-axis
LayerNorm, and PixelShuffle/Unshuffle become free reshapes. Depthwise convs
use feature_group_count so XLA lowers them to VPU-friendly per-channel
convolutions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .attention import CrossAttention


# ---------------------------------------------------------------- primitives

def pixel_unshuffle(x, r: int):
    """NHWC space-to-depth matching torch PixelUnshuffle channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x, r: int):
    """NHWC depth-to-space matching torch PixelShuffle channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // (r * r), r, r)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c // (r * r))


def w_layer_norm(x, dtype):
    """No-affine LayerNorm over the channel axis (reference WuerstchenLayerNorm)."""
    return nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                        dtype=dtype)(x)


def timestep_embedding(r, c_r: int, max_positions: int = 10000):
    """Sinusoidal embedding of the continuous ratio r in [0,1]
    (reference WuerstchenPrior.gen_r_embedding)."""
    r = r.astype(jnp.float32) * max_positions
    half = c_r // 2
    emb = math.log(max_positions) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = r[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)


class GlobalResponseNorm(nn.Module):
    """ConvNeXt-V2 GRN over NHWC (reference modeling_wuerstchen_common.py:70-90;
    the spatial L2 norm runs in fp32 like the reference's cast-up)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        agg = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2),
                               keepdims=True)).astype(x.dtype)
        stand = agg / (jnp.mean(agg, axis=-1, keepdims=True) + 1e-6)
        return gamma.astype(x.dtype) * (x * stand) + beta.astype(x.dtype) + x


class TimestepBlock(nn.Module):
    """FiLM-style modulation from the timestep embedding."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_embed):
        ab = nn.Dense(self.channels * 2, dtype=self.dtype, name="mapper")(t_embed)
        a, b = jnp.split(ab[:, None, None, :], 2, axis=-1)
        return x * (1 + a) + b


class WResBlock(nn.Module):
    """Prior ResBlock: depthwise conv -> norm -> (Dense, GELU, GRN, Dense)."""

    channels: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip=None):
        c, k = self.channels, self.kernel_size
        res = x
        if x_skip is not None:
            x = jnp.concatenate([x, x_skip], axis=-1)
        x = nn.Conv(c, (k, k), padding=((k // 2,) * 2,) * 2,
                    feature_group_count=c, dtype=self.dtype, name="depthwise")(x)
        x = w_layer_norm(x, self.dtype)
        x = nn.Dense(c * 4, dtype=self.dtype, name="channelwise_0")(x)
        x = nn.gelu(x, approximate=False)
        x = GlobalResponseNorm(dtype=self.dtype, name="channelwise_2")(x)
        x = nn.Dense(c, dtype=self.dtype, name="channelwise_4")(x)
        return x + res


class ResBlockStageB(nn.Module):
    """DiffNeXt ResBlock: skip concatenates after the norm (diffnext.py:267-288)."""

    channels: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip=None):
        c, k = self.channels, self.kernel_size
        res = x
        x = nn.Conv(c, (k, k), padding=((k // 2,) * 2,) * 2,
                    feature_group_count=c, dtype=self.dtype, name="depthwise")(x)
        x = w_layer_norm(x, self.dtype)
        if x_skip is not None:
            x = jnp.concatenate([x, x_skip], axis=-1)
        x = nn.Dense(c * 4, dtype=self.dtype, name="channelwise_0")(x)
        x = nn.gelu(x, approximate=False)
        x = GlobalResponseNorm(dtype=self.dtype, name="channelwise_2")(x)
        x = nn.Dense(c, dtype=self.dtype, name="channelwise_4")(x)
        return x + res


class WAttnBlock(nn.Module):
    """Self+cross attention: kv = [flattened image tokens; mapped condition]."""

    channels: int
    cond_channels: int
    num_heads: int
    self_attn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv):
        b, h, w, c = x.shape
        kv = nn.Dense(self.channels, dtype=self.dtype, name="kv_mapper")(nn.silu(kv))
        norm_x = w_layer_norm(x, self.dtype)
        tokens = norm_x.reshape(b, h * w, c)
        context = jnp.concatenate([tokens, kv], axis=1) if self.self_attn else kv
        out = CrossAttention(self.num_heads, c // self.num_heads, qkv_bias=True,
                             dtype=self.dtype, name="attention")(tokens, context)
        return x + out.reshape(b, h, w, c)


# -------------------------------------------------------------------- prior

@dataclasses.dataclass
class WuerstchenPriorConfig(BaseConfig):
    model_type = "wuerstchen-prior"
    c_in: int = 16
    c: int = 1280
    c_cond: int = 1024
    c_r: int = 64
    depth: int = 16
    nhead: int = 16


class WuerstchenPriorModule(nn.Module):
    """Stage-C prior over EfficientNet latents (reference
    modeling_wuerstchen_prior.py:43-199). Straight trunk of depth x
    (ResBlock, TimestepBlock, AttnBlock); output heads a/b combine as
    (x - a) / (|1 - b| + 1e-5)."""

    config: WuerstchenPriorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, r, c):
        cfg = self.config
        x_in = x
        x = nn.Conv(cfg.c, (1, 1), dtype=self.dtype, name="projection")(x)
        ce = nn.Dense(cfg.c, dtype=self.dtype, name="cond_mapper_0")(c)
        ce = nn.leaky_relu(ce, 0.2)
        ce = nn.Dense(cfg.c, dtype=self.dtype, name="cond_mapper_2")(ce)
        re = timestep_embedding(r, cfg.c_r).astype(self.dtype)
        for i in range(cfg.depth):
            x = WResBlock(cfg.c, dtype=self.dtype, name=f"blocks_{3 * i}")(x)
            x = TimestepBlock(cfg.c, dtype=self.dtype, name=f"blocks_{3 * i + 1}")(x, re)
            x = WAttnBlock(cfg.c, cfg.c, cfg.nhead, dtype=self.dtype,
                           name=f"blocks_{3 * i + 2}")(x, ce)
        x = w_layer_norm(x, self.dtype)
        ab = nn.Conv(cfg.c_in * 2, (1, 1), dtype=self.dtype, name="out_1")(x)
        a, b = jnp.split(ab, 2, axis=-1)
        return (x_in - a) / (jnp.abs(1.0 - b) + 1e-5)


class WuerstchenPrior(PretrainedModel):
    config_class = WuerstchenPriorConfig
    module_class = WuerstchenPriorModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 4, 4, config.c_in)), jnp.zeros((1,)),
                 jnp.zeros((1, 8, config.c_cond))), {})


# ----------------------------------------------------------------- diffnext

@dataclasses.dataclass
class WuerstchenDiffNeXtConfig(BaseConfig):
    model_type = "wuerstchen-diffnext"
    c_in: int = 4
    c_out: int = 4
    c_r: int = 64
    patch_size: int = 2
    c_cond: int = 1024
    c_hidden: Tuple[int, ...] = (320, 640, 1280, 1280)
    nhead: Tuple[int, ...] = (-1, 10, 20, 20)
    blocks: Tuple[int, ...] = (4, 4, 14, 4)
    level_config: Tuple[str, ...] = ("CT", "CTA", "CTA", "CTA")
    inject_effnet: Tuple[bool, ...] = (False, True, True, True)
    effnet_embd: int = 16
    clip_embd: int = 1024
    kernel_size: int = 3


class WuerstchenDiffNeXtModule(nn.Module):
    """Stage-B decoder UNet (reference modeling_wuerstchen_diffnext.py:40-264):
    pixel-unshuffle patch embedding, C/T/A block levels with EfficientNet
    latent injection, pixel-shuffle classifier producing (a, b) heads."""

    config: WuerstchenDiffNeXtConfig
    dtype: jnp.dtype = jnp.float32

    def _block(self, kind, level, idx, c_skip):
        cfg = self.config
        if kind == "C":
            return ResBlockStageB(cfg.c_hidden[level], cfg.kernel_size,
                                  dtype=self.dtype, name=idx)
        if kind == "T":
            return TimestepBlock(cfg.c_hidden[level], dtype=self.dtype, name=idx)
        return WAttnBlock(cfg.c_hidden[level], cfg.c_cond, cfg.nhead[level],
                          dtype=self.dtype, name=idx)

    @nn.compact
    def __call__(self, x, r, effnet, clip=None, x_cat=None, eps: float = 1e-3,
                 return_noise: bool = True):
        cfg = self.config
        if x_cat is not None:
            x = jnp.concatenate([x, x_cat], axis=-1)
        x_in = x
        re = timestep_embedding(r, cfg.c_r).astype(self.dtype)
        if clip is not None:
            clip = nn.Dense(cfg.c_cond, dtype=self.dtype, name="clip_mapper")(clip)
            clip = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                                dtype=self.dtype, name="seq_norm")(clip)

        def effnet_cond(i, hw):
            # reference upsamples the effnet latent bicubic/align_corners; the
            # boundary sampling differs slightly from jax.image.resize here.
            up = jax.image.resize(effnet.astype(jnp.float32),
                                  (effnet.shape[0], *hw, effnet.shape[-1]),
                                  "cubic").astype(self.dtype)
            return nn.Conv(cfg.c_cond, (1, 1), dtype=self.dtype,
                           name=f"effnet_mappers_{i}")(up)

        # embedding: pixel-unshuffle + 1x1 conv + norm
        x = pixel_unshuffle(x, cfg.patch_size)
        x = nn.Conv(cfg.c_hidden[0], (1, 1), dtype=self.dtype, name="embedding_1")(x)
        x = w_layer_norm(x, self.dtype)

        levels = len(cfg.c_hidden)
        level_outputs = []
        for i in range(levels):
            if i > 0:
                x = w_layer_norm(x, self.dtype)
                x = nn.Conv(cfg.c_hidden[i], (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f"down_{i}_0")(x)
            eff = effnet_cond(i, x.shape[1:3]) if cfg.inject_effnet[i] else None
            for j in range(cfg.blocks[i]):
                for k, kind in enumerate(cfg.level_config[i]):
                    blk = self._block(kind, i, f"down_{i}_{j}_{k}", 0)
                    if kind == "C":
                        x = blk(x, eff)
                    elif kind == "T":
                        x = blk(x, re)
                    else:
                        x = blk(x, clip)
            level_outputs.insert(0, x)

        x = level_outputs[0]
        for ui, i in enumerate(reversed(range(levels))):
            eff = effnet_cond(levels + ui, x.shape[1:3]) if cfg.inject_effnet[i] else None
            for j in range(cfg.blocks[i]):
                for k, kind in enumerate(cfg.level_config[i]):
                    blk = self._block(kind, i, f"up_{ui}_{j}_{k}", 0)
                    if kind == "C":
                        skip = level_outputs[ui] if j == k == 0 and ui > 0 else None
                        if eff is not None:
                            skip = eff if skip is None else jnp.concatenate(
                                [skip, eff], axis=-1)
                        x = blk(x, skip)
                    elif kind == "T":
                        x = blk(x, re)
                    else:
                        x = blk(x, clip)
            if i > 0:
                x = w_layer_norm(x, self.dtype)
                x = nn.ConvTranspose(cfg.c_hidden[i - 1], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"upsample_{ui}")(x)

        x = w_layer_norm(x, self.dtype)
        x = nn.Conv(2 * cfg.c_out * cfg.patch_size ** 2, (1, 1), dtype=self.dtype,
                    name="clf_1")(x)
        x = pixel_shuffle(x, cfg.patch_size)
        a, b = jnp.split(x, 2, axis=-1)
        b = nn.sigmoid(b) * (1 - eps * 2) + eps
        if return_noise:
            return (x_in - a) / b
        return a, b


class WuerstchenDiffNeXt(PretrainedModel):
    config_class = WuerstchenDiffNeXtConfig
    module_class = WuerstchenDiffNeXtModule

    @classmethod
    def example_inputs(cls, config):
        r = config.patch_size * 2 ** (len(config.c_hidden) - 1)
        return ((jnp.zeros((1, r, r, config.c_in)), jnp.zeros((1,)),
                 jnp.zeros((1, 2, 2, config.effnet_embd)),
                 jnp.zeros((1, 8, config.clip_embd))), {})


# ------------------------------------------------------------- paella vqgan

@dataclasses.dataclass
class PaellaVQConfig(BaseConfig):
    model_type = "paella-vq"
    in_channels: int = 3
    out_channels: int = 3
    up_down_scale_factor: int = 2
    levels: int = 2
    bottleneck_blocks: int = 12
    embed_dim: int = 384
    latent_channels: int = 4
    num_vq_embeddings: int = 8192
    scale_factor: float = 0.3764


class MixingResidualBlock(nn.Module):
    """Paella block: gamma-gated depthwise + channelwise branches
    (modeling_paella_vq_model.py:28-63)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        g = self.param("gammas", nn.initializers.zeros, (6,)).astype(x.dtype)
        t = w_layer_norm(x, self.dtype) * (1 + g[0]) + g[1]
        t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        t = nn.Conv(c, (3, 3), padding="VALID", feature_group_count=c,
                    dtype=self.dtype, name="depthwise_1")(t)
        x = x + t * g[2]
        t = w_layer_norm(x, self.dtype) * (1 + g[3]) + g[4]
        t = nn.Dense(c * 4, dtype=self.dtype, name="channelwise_0")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(c, dtype=self.dtype, name="channelwise_2")(t)
        return x + t * g[5]


class _CroppedConvTranspose(nn.Module):
    """torch ConvTranspose2d(kernel=4, stride=2, padding=1) -> exact 2x upsample."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="VALID", dtype=self.dtype, name="conv")(x)
        return y[:, 1:-1, 1:-1, :]


class PaellaVQModule(nn.Module):
    config: PaellaVQConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        c_levels = [cfg.embed_dim // (2 ** i) for i in reversed(range(cfg.levels))]
        self.c_levels = c_levels
        self.in_conv = nn.Conv(c_levels[0], (1, 1), dtype=self.dtype)
        downs = []
        for i in range(cfg.levels):
            if i > 0:
                downs.append(nn.Conv(c_levels[i], (4, 4), strides=(2, 2),
                                     padding=((1, 1), (1, 1)), dtype=self.dtype))
            downs.append(MixingResidualBlock(c_levels[i], dtype=self.dtype))
        self.down_blocks = downs
        self.to_latent = nn.Conv(cfg.latent_channels, (1, 1), use_bias=False,
                                 dtype=self.dtype)
        # reference ends the encoder with BatchNorm2D; folded here into
        # affine params over frozen running stats (inference semantics).
        self.bn_scale = self.param("bn_scale", nn.initializers.ones,
                                   (cfg.latent_channels,))
        self.bn_bias = self.param("bn_bias", nn.initializers.zeros,
                                  (cfg.latent_channels,))
        self.bn_mean = self.param("bn_mean", nn.initializers.zeros,
                                  (cfg.latent_channels,))
        self.bn_var = self.param("bn_var", nn.initializers.ones,
                                 (cfg.latent_channels,))
        self.codebook = self.param("codebook", nn.initializers.uniform(1.0),
                                   (cfg.num_vq_embeddings, cfg.latent_channels))
        self.from_latent = nn.Conv(c_levels[-1], (1, 1), dtype=self.dtype)
        ups = []
        for i in range(cfg.levels):
            for _ in range(cfg.bottleneck_blocks if i == 0 else 1):
                ups.append(MixingResidualBlock(c_levels[cfg.levels - 1 - i],
                                               dtype=self.dtype))
            if i < cfg.levels - 1:
                # torch ConvTranspose2d(k=4, s=2, p=1): VALID output cropped by 1
                ups.append(_CroppedConvTranspose(c_levels[cfg.levels - 2 - i],
                                                 dtype=self.dtype))
        self.up_blocks = ups
        self.out_conv = nn.Conv(cfg.out_channels * cfg.up_down_scale_factor ** 2,
                                (1, 1), dtype=self.dtype)

    def encode(self, x):
        cfg = self.config
        h = self.in_conv(pixel_unshuffle(x, cfg.up_down_scale_factor))
        for blk in self.down_blocks:
            h = blk(h)
        h = self.to_latent(h)
        inv = jax.lax.rsqrt(self.bn_var.astype(jnp.float32) + 1e-5).astype(h.dtype)
        return (h - self.bn_mean.astype(h.dtype)) * inv * \
            self.bn_scale.astype(h.dtype) + self.bn_bias.astype(h.dtype)

    def quantize(self, z):
        flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
        code = self.codebook.astype(jnp.float32)
        d = (jnp.sum(flat ** 2, -1, keepdims=True) - 2 * flat @ code.T
             + jnp.sum(code ** 2, -1)[None])
        idx = jnp.argmin(d, axis=-1)
        zq = code[idx].reshape(z.shape).astype(z.dtype)
        return z + jax.lax.stop_gradient(zq - z), idx.reshape(z.shape[:-1])

    def decode(self, z, force_not_quantize: bool = True):
        if not force_not_quantize:
            z, _ = self.quantize(z)
        x = self.from_latent(z)
        for blk in self.up_blocks:
            x = blk(x)
        return pixel_shuffle(self.out_conv(x), self.config.up_down_scale_factor)

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z)


class PaellaVQModel(PretrainedModel):
    config_class = PaellaVQConfig
    module_class = PaellaVQModule

    @classmethod
    def example_inputs(cls, config):
        r = config.up_down_scale_factor * 2 ** (config.levels - 1)
        return ((jnp.zeros((1, 4 * r, 4 * r, config.in_channels)),), {})

    def encode(self, x):
        return self.module.apply({"params": self.params}, x,
                                 method=self.module_class.encode)

    def decode(self, z, force_not_quantize: bool = True):
        return self.module.apply({"params": self.params}, z, force_not_quantize,
                                 method=self.module_class.decode)
