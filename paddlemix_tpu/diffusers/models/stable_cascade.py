"""Stable Cascade (Wuerstchen v3) stage-C prior and stage-B decoder as one
configurable UNet (reference models/stable_cascade/modules/stage_c.py:55-362
and stage_b.py:25-345; shared blocks common.py:38-151). Stage A is the Paella
VQGAN re-used from .wuerstchen (reference stage_a.py mirrors
modeling_paella_vq_model.py with scale_factor=0.43).

NHWC throughout: LayerNorm2d's transpose sandwich disappears, PixelShuffle is
a reshape, and the bilinear align-corners resizes are two static gathers."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .wuerstchen import (
    ResBlockStageB,
    WAttnBlock,
    pixel_shuffle,
    pixel_unshuffle,
    timestep_embedding,
    w_layer_norm,
)


def resize_bilinear_ac(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True over NHWC (static shapes)."""

    def axis_weights(n_in, n_out):
        if n_in == 1 or n_out == 1:
            idx = jnp.zeros((n_out,), jnp.int32)
            return idx, idx, jnp.zeros((n_out,), jnp.float32)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        return lo, hi, pos - lo.astype(jnp.float32)

    dt = x.dtype
    x = x.astype(jnp.float32)
    lo, hi, w = axis_weights(x.shape[1], out_h)
    x = x[:, lo] * (1 - w)[None, :, None, None] + x[:, hi] * w[None, :, None, None]
    lo, hi, w = axis_weights(x.shape[2], out_w)
    x = x[:, :, lo] * (1 - w)[None, None, :, None] + x[:, :, hi] * w[None, None, :, None]
    return x.astype(dt)


class MultiTimestepBlock(nn.Module):
    """FiLM from [r_embed | cond embeds] split along the feature axis
    (reference common.py:135-151: mapper + mapper_<cond> per t_cond)."""

    channels: int
    conds: Tuple[str, ...] = ("sca", "crp")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_embed):
        parts = jnp.split(t_embed, len(self.conds) + 1, axis=1)
        ab = nn.Dense(self.channels * 2, dtype=self.dtype, name="mapper")(parts[0])
        a, b = jnp.split(ab, 2, axis=-1)
        for i, c in enumerate(self.conds):
            abc = nn.Dense(self.channels * 2, dtype=self.dtype,
                           name=f"mapper_{c}")(parts[i + 1])
            ac, bc = jnp.split(abc, 2, axis=-1)
            a, b = a + ac, b + bc
        return x * (1 + a[:, None, None, :]) + b[:, None, None, :]


class FeedForwardBlock(nn.Module):
    """norm -> Dense(4c) -> GELU -> GRN -> Dense(c), residual (common.py:118-132)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .wuerstchen import GlobalResponseNorm

        c = self.channels
        h = w_layer_norm(x, self.dtype)
        h = nn.Dense(c * 4, dtype=self.dtype, name="channelwise_0")(h)
        h = nn.gelu(h, approximate=False)
        h = GlobalResponseNorm(dtype=self.dtype, name="channelwise_2")(h)
        h = nn.Dense(c, dtype=self.dtype, name="channelwise_4")(h)
        return x + h


@dataclasses.dataclass
class StableCascadeUNetConfig(BaseConfig):
    """Stage C defaults; stage B via from_dict(STAGE_B_CONFIG)-style overrides."""

    model_type = "stable-cascade-unet"
    c_in: int = 16
    c_out: int = 16
    c_r: int = 64
    patch_size: int = 1
    c_cond: int = 2048
    c_hidden: Tuple[int, ...] = (2048, 2048)
    nhead: Tuple[int, ...] = (32, 32)
    blocks_down: Tuple[int, ...] = (8, 24)
    blocks_up: Tuple[int, ...] = (24, 8)
    block_repeat_down: Tuple[int, ...] = (1, 1)
    block_repeat_up: Tuple[int, ...] = (1, 1)
    level_config: Tuple[str, ...] = ("CTA", "CTA")
    kernel_size: int = 3
    self_attn: bool = True
    t_conds: Tuple[str, ...] = ("sca", "crp")
    switch_level: Tuple[bool, ...] = (False,)
    # stage-C conditioning
    c_clip_text: Optional[int] = 1280
    c_clip_text_pooled: Optional[int] = 1280
    c_clip_img: Optional[int] = 768
    c_clip_seq: int = 4
    # stage-B conditioning
    c_clip: Optional[int] = None
    c_effnet: Optional[int] = None
    c_pixels: Optional[int] = None
    # "updown": 1x1 conv, resizing only where switch_level is True (stage C,
    # stage_c.py:33-52 UpDownBlock2d); "conv": strided conv / conv-transpose
    # k=2 s=2 (stage B, stage_b.py:108-158)
    updown_mode: str = "updown"


STAGE_B_OVERRIDES = dict(
    c_in=4, c_out=4, patch_size=2, c_cond=1280, c_hidden=(320, 640, 1280, 1280),
    nhead=(-1, -1, 20, 20), blocks_down=(2, 6, 28, 6), blocks_up=(6, 28, 6, 2),
    block_repeat_down=(1, 1, 1, 1), block_repeat_up=(3, 3, 2, 2),
    level_config=("CT", "CT", "CTA", "CTA"), c_clip_text=None,
    c_clip_text_pooled=None, c_clip_img=None, c_clip=1280, c_clip_seq=4,
    c_effnet=16, c_pixels=3, t_conds=("sca",), switch_level=(False,) * 3,
    self_attn=True, updown_mode="conv",
)


class StableCascadeUNetModule(nn.Module):
    config: StableCascadeUNetConfig
    dtype: jnp.dtype = jnp.float32

    def _run_block(self, kind, level, name, x, extras):
        cfg = self.config
        c = cfg.c_hidden[level]
        if kind == "C":
            return ResBlockStageB(c, cfg.kernel_size, dtype=self.dtype,
                                  name=name)(x, extras.get("skip"))
        if kind == "T":
            return MultiTimestepBlock(c, cfg.t_conds, dtype=self.dtype,
                                      name=name)(x, extras["r_embed"])
        if kind == "A":
            return WAttnBlock(c, cfg.c_cond, cfg.nhead[level],
                              self_attn=cfg.self_attn, dtype=self.dtype,
                              name=name)(x, extras["clip"])
        return FeedForwardBlock(c, dtype=self.dtype, name=name)(x)

    @nn.compact
    def __call__(self, x, r, clip_text=None, clip_text_pooled=None,
                 clip_img=None, effnet=None, pixels=None, clip=None, **t_conds):
        cfg = self.config
        b = x.shape[0]

        r_embed = timestep_embedding(r, cfg.c_r)
        for c in cfg.t_conds:
            tc = t_conds.get(c, jnp.zeros_like(r))
            r_embed = jnp.concatenate([r_embed, timestep_embedding(tc, cfg.c_r)], axis=1)
        r_embed = r_embed.astype(self.dtype)

        # conditioning tokens (stage C: text seq + pooled + image; stage B: clip)
        parts = []
        if cfg.c_clip_text is not None and clip_text is not None:
            parts.append(nn.Dense(cfg.c_cond, dtype=self.dtype,
                                  name="clip_txt_mapper")(clip_text))
        if cfg.c_clip_text_pooled is not None and clip_text_pooled is not None:
            if clip_text_pooled.ndim == 2:
                clip_text_pooled = clip_text_pooled[:, None]
            p = nn.Dense(cfg.c_cond * cfg.c_clip_seq, dtype=self.dtype,
                         name="clip_txt_pooled_mapper")(clip_text_pooled)
            parts.append(p.reshape(b, clip_text_pooled.shape[1] * cfg.c_clip_seq, -1))
        if cfg.c_clip_img is not None and clip_img is not None:
            if clip_img.ndim == 2:
                clip_img = clip_img[:, None]
            p = nn.Dense(cfg.c_cond * cfg.c_clip_seq, dtype=self.dtype,
                         name="clip_img_mapper")(clip_img)
            parts.append(p.reshape(b, clip_img.shape[1] * cfg.c_clip_seq, -1))
        if cfg.c_clip is not None and clip is not None:
            if clip.ndim == 2:
                clip = clip[:, None]
            p = nn.Dense(cfg.c_cond * cfg.c_clip_seq, dtype=self.dtype,
                         name="clip_mapper")(clip)
            parts.append(p.reshape(b, clip.shape[1] * cfg.c_clip_seq, -1))
        clip_tokens = jnp.concatenate(parts, axis=1)
        clip_tokens = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                                   dtype=self.dtype, name="clip_norm")(clip_tokens)

        # embedding
        x = pixel_unshuffle(x, cfg.patch_size)
        x = nn.Conv(cfg.c_hidden[0], (1, 1), dtype=self.dtype, name="embedding_1")(x)
        x = w_layer_norm(x, self.dtype)

        # stage-B latent/pixel injections (stage_b.py:321-334)
        if cfg.c_effnet is not None and effnet is not None:
            h = resize_bilinear_ac(effnet, x.shape[1], x.shape[2]).astype(self.dtype)
            h = nn.Conv(cfg.c_hidden[0] * 4, (1, 1), dtype=self.dtype,
                        name="effnet_mapper_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Conv(cfg.c_hidden[0], (1, 1), dtype=self.dtype,
                        name="effnet_mapper_2")(h)
            x = x + w_layer_norm(h, self.dtype)
        if cfg.c_pixels is not None:
            if pixels is None:
                pixels = jnp.zeros((b, 8, 8, cfg.c_pixels), x.dtype)
            h = nn.Conv(cfg.c_hidden[0] * 4, (1, 1), dtype=self.dtype,
                        name="pixels_mapper_0")(pixels)
            h = nn.gelu(h, approximate=False)
            h = nn.Conv(cfg.c_hidden[0], (1, 1), dtype=self.dtype,
                        name="pixels_mapper_2")(h)
            h = w_layer_norm(h, self.dtype)
            x = x + resize_bilinear_ac(h, x.shape[1], x.shape[2]).astype(self.dtype)

        extras = {"r_embed": r_embed, "clip": clip_tokens}
        levels = len(cfg.c_hidden)

        # down path
        level_outputs = []
        for i in range(levels):
            if i > 0:
                x = w_layer_norm(x, self.dtype)
                if cfg.updown_mode == "conv":
                    x = nn.Conv(cfg.c_hidden[i], (2, 2), strides=(2, 2),
                                dtype=self.dtype, name=f"down_map_{i}")(x)
                else:  # UpDownBlock2d "down": 1x1 conv, then optional resize
                    x = nn.Conv(cfg.c_hidden[i], (1, 1), dtype=self.dtype,
                                name=f"down_map_{i}")(x)
                    if cfg.switch_level[i - 1]:
                        x = resize_bilinear_ac(x, x.shape[1] // 2, x.shape[2] // 2)
            for rep in range(cfg.block_repeat_down[i]):
                for j in range(cfg.blocks_down[i]):
                    for k, kind in enumerate(cfg.level_config[i]):
                        x = self._run_block(kind, i, f"down_{i}_{j}_{k}", x, extras)
                if rep < cfg.block_repeat_down[i] - 1:
                    x = nn.Conv(cfg.c_hidden[i], (1, 1), dtype=self.dtype,
                                name=f"down_rep_{i}_{rep}")(x)
            level_outputs.insert(0, x)

        # up path
        x = level_outputs[0]
        for ui, i in enumerate(reversed(range(levels))):
            for rep in range(cfg.block_repeat_up[::-1][ui]):
                for j in range(cfg.blocks_up[::-1][ui]):
                    for k, kind in enumerate(cfg.level_config[i]):
                        ex = dict(extras)
                        if kind == "C" and j == k == 0 and ui > 0:
                            skip = level_outputs[ui]
                            if x.shape[1:3] != skip.shape[1:3]:
                                x = resize_bilinear_ac(x, skip.shape[1], skip.shape[2])
                            ex["skip"] = skip
                        x = self._run_block(kind, i, f"up_{ui}_{rep}_{j}_{k}", x, ex)
                if rep < cfg.block_repeat_up[::-1][ui] - 1:
                    x = nn.Conv(cfg.c_hidden[i], (1, 1), dtype=self.dtype,
                                name=f"up_rep_{ui}_{rep}")(x)
            if i > 0:
                x = w_layer_norm(x, self.dtype)
                if cfg.updown_mode == "conv":
                    x = nn.ConvTranspose(cfg.c_hidden[i - 1], (2, 2), strides=(2, 2),
                                         dtype=self.dtype, name=f"up_map_{ui}")(x)
                else:  # UpDownBlock2d "up": optional resize, then 1x1 conv
                    if cfg.switch_level[i - 1]:
                        x = resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
                    x = nn.Conv(cfg.c_hidden[i - 1], (1, 1), dtype=self.dtype,
                                name=f"up_map_{ui}")(x)

        x = w_layer_norm(x, self.dtype)
        x = nn.Conv(cfg.c_out * cfg.patch_size ** 2, (1, 1), dtype=self.dtype,
                    name="clf_1")(x)
        return pixel_shuffle(x, cfg.patch_size)


class StableCascadeUNet(PretrainedModel):
    config_class = StableCascadeUNetConfig
    module_class = StableCascadeUNetModule

    @classmethod
    def stage_b_config(cls, **overrides):
        return StableCascadeUNetConfig.from_dict({**STAGE_B_OVERRIDES, **overrides})

    @classmethod
    def example_inputs(cls, config):
        r = config.patch_size * 2 ** (len(config.c_hidden) - 1)
        kwargs = {}
        if config.c_clip_text is not None:
            kwargs["clip_text"] = jnp.zeros((1, 8, config.c_clip_text))
        if config.c_clip_text_pooled is not None:
            kwargs["clip_text_pooled"] = jnp.zeros((1, config.c_clip_text_pooled))
        if config.c_clip_img is not None:
            kwargs["clip_img"] = jnp.zeros((1, config.c_clip_img))
        if config.c_clip is not None:
            kwargs["clip"] = jnp.zeros((1, 8, config.c_clip))
        if config.c_effnet is not None:
            kwargs["effnet"] = jnp.zeros((1, 2, 2, config.c_effnet))
        return ((jnp.zeros((1, r, r, config.c_in)), jnp.zeros((1,))), kwargs)
