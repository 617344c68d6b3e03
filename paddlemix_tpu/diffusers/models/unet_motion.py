"""Motion UNet (AnimateDiff / text-to-video).

Rebuild of the reference's unet_motion_model.py (UNetMotionModel:167,
MotionModules:48, MotionAdapter:79) + transformer_temporal.py
TransformerTemporalModel:42: the SD UNet's spatial blocks run with frames
folded into the batch; after every resnet/attention layer a motion module
attends over the frame axis per spatial site (double self-attention blocks
with sinusoidal frame-position embeddings, GEGLU ff).

Param paths mirror the diffusers MotionAdapter layout
(down_blocks_{i}.motion_modules_{j}.{norm,proj_in,transformer_blocks_k,...}),
so real AnimateDiff motion-adapter checkpoints load via
``load_motion_adapter``. TPU notes: the frame axis is a reshape, attention
routes through the flash kernel, frame counts are static."""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.modeling import PretrainedModel
from .attention import CrossAttention, GEGLUFeedForward, Transformer2DModel
from .embeddings import TimestepEmbedding, Timesteps
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D
from .unet_2d_condition import UNet2DConditionConfig


@dataclasses.dataclass
class UNetMotionConfig(UNet2DConditionConfig):
    model_type = "unet_motion"
    num_frames: int = 16
    motion_num_heads: int = 8
    motion_max_seq_length: int = 32
    use_motion_mid_block: bool = True


def _sinusoidal_pe(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class MotionTransformerBlock(nn.Module):
    """BasicTransformerBlock(double_self_attention=True,
    positional_embeddings="sinusoidal") over the frame axis."""

    num_heads: int
    head_dim: int
    max_seq_length: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = x.shape[1]
        pe = jnp.asarray(_sinusoidal_pe(self.max_seq_length,
                                        x.shape[-1]))[None, :f]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x) + pe.astype(x.dtype)
        x = x + CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                               name="attn1")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x) + pe.astype(x.dtype)
        x = x + CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                               name="attn2")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h)


class MotionModule(nn.Module):
    """TransformerTemporalModel (reference transformer_temporal.py:42):
    GroupNorm -> proj_in -> temporal blocks -> proj_out + residual.
    Input (B*F, H, W, C)."""

    num_heads: int
    num_frames: int
    num_layers: int = 1
    groups: int = 32
    max_seq_length: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bf, hh, ww, c = x.shape
        f = self.num_frames
        b = bf // f
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        # (B*F, H, W, C) -> (B*HW, F, C): attention over frames per site
        h = h.reshape(b, f, hh * ww, c).transpose(0, 2, 1, 3).reshape(
            b * hh * ww, f, c)
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        head_dim = c // self.num_heads
        for i in range(self.num_layers):
            h = MotionTransformerBlock(self.num_heads, head_dim,
                                       self.max_seq_length, dtype=self.dtype,
                                       name=f"transformer_blocks_{i}")(h)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(b, hh * ww, f, c).transpose(0, 2, 1, 3).reshape(
            bf, hh, ww, c)
        return h + residual


class _MotionDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int       # spatial attention heads (0 = plain DownBlock)
    tf_layers: int
    use_linear_projection: bool
    motion: dict
    add_downsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, refs=None):
        outs = []
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            if self.num_heads:
                x = Transformer2DModel(
                    self.num_heads, self.out_channels // self.num_heads,
                    num_layers=self.tf_layers,
                    use_linear_projection=self.use_linear_projection,
                    groups=self.groups, dtype=self.dtype,
                    name=f"attentions_{j}")(
                    x, context,
                    extra_kv=refs.pop(0) if refs else None)
            x = MotionModule(**self.motion, dtype=self.dtype,
                             name=f"motion_modules_{j}")(x)
            outs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outs.append(x)
        return x, outs


class _MotionUpBlock(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    tf_layers: int
    use_linear_projection: bool
    motion: dict
    add_upsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, refs=None):
        for j in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            if self.num_heads:
                x = Transformer2DModel(
                    self.num_heads, self.out_channels // self.num_heads,
                    num_layers=self.tf_layers,
                    use_linear_projection=self.use_linear_projection,
                    groups=self.groups, dtype=self.dtype,
                    name=f"attentions_{j}")(
                    x, context,
                    extra_kv=refs.pop(0) if refs else None)
            x = MotionModule(**self.motion, dtype=self.dtype,
                             name=f"motion_modules_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class _MotionMidBlock(nn.Module):
    channels: int
    num_heads: int
    tf_layers: int
    use_linear_projection: bool
    motion: dict
    use_motion: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, refs=None):
        head_dim = self.channels // self.num_heads
        x = ResnetBlock2D(self.channels, groups=self.groups, dtype=self.dtype,
                          name="resnets_0")(x, temb)
        x = Transformer2DModel(self.num_heads, head_dim,
                               num_layers=self.tf_layers,
                               use_linear_projection=self.use_linear_projection,
                               groups=self.groups, dtype=self.dtype,
                               name="attentions_0")(
            x, context, extra_kv=refs.pop(0) if refs else None)
        if self.use_motion:
            x = MotionModule(**self.motion, dtype=self.dtype,
                             name="motion_modules_0")(x)
        x = ResnetBlock2D(self.channels, groups=self.groups, dtype=self.dtype,
                          name="resnets_1")(x, temb)
        return x


class UNetMotionModule(nn.Module):
    config: UNetMotionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 added_cond_kwargs=None, reference_features=None,
                 pose_cond=None):
        """sample: (B, T, H, W, C); context: (B, S, D) broadcast to frames.
        added_cond_kwargs carries SDXL text_time conditioning for the
        Hotshot-XL variant (reference pipelines/hotshot_xl: AnimateDiff-style
        motion modules on the SDXL backbone)."""
        cfg = self.config
        groups = cfg.norm_num_groups
        b, t, hh, ww, c = sample.shape
        sample = sample.reshape(b * t, hh, ww, c)
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t_rep = jnp.repeat(timestep, t)
        ctx = jnp.repeat(encoder_hidden_states, t, axis=0)

        time_embed_dim = cfg.block_out_channels[0] * 4
        t_emb = Timesteps(cfg.block_out_channels[0], cfg.flip_sin_to_cos,
                          cfg.freq_shift)(t_rep)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time":
            text_embeds = jnp.repeat(added_cond_kwargs["text_embeds"], t, axis=0)
            time_ids = jnp.repeat(added_cond_kwargs["time_ids"], t, axis=0)
            time_embeds = Timesteps(cfg.addition_time_embed_dim,
                                    cfg.flip_sin_to_cos, cfg.freq_shift)(
                time_ids.reshape(-1)).reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1)
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                          name="add_embedding")(
                add_embeds.astype(self.dtype))

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="conv_in")(sample)
        if pose_cond is not None:
            # AnimateAnyone PoseGuider feature added after conv_in
            # (reference animate_anyone/unet_3d.py forward)
            sample = sample + pose_cond.reshape(sample.shape).astype(sample.dtype)
        # reference features consumed positionally in traversal order
        # (down asc -> mid -> up asc), matching extract_reference_features
        refs = list(reference_features) if reference_features is not None \
            else None
        heads = cfg.heads_per_block
        tf_layers = cfg.tf_layers_per_block
        motion = dict(num_heads=cfg.motion_num_heads, num_frames=t,
                      groups=groups, max_seq_length=cfg.motion_max_seq_length)

        skips = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            last = i == len(cfg.down_block_types) - 1
            cross = block_type == "CrossAttnDownBlock2D"
            sample, outs = _MotionDownBlock(
                ch, cfg.layers_per_block, heads[i] if cross else 0,
                tf_layers[i], cfg.use_linear_projection, motion,
                add_downsample=not last, groups=groups, dtype=self.dtype,
                name=f"down_blocks_{i}")(sample, emb, ctx, refs=refs)
            skips.extend(outs)

        sample = _MotionMidBlock(
            cfg.block_out_channels[-1], heads[-1], tf_layers[-1],
            cfg.use_linear_projection, motion,
            use_motion=cfg.use_motion_mid_block, groups=groups,
            dtype=self.dtype, name="mid_block")(sample, emb, ctx, refs=refs)

        for i, block_type in enumerate(cfg.up_block_types):
            rev = list(reversed(cfg.block_out_channels))
            ch = rev[i]
            jdx = len(cfg.block_out_channels) - 1 - i
            last = i == len(cfg.up_block_types) - 1
            cross = block_type == "CrossAttnUpBlock2D"
            n_layers = cfg.layers_per_block + 1
            block_skips = [skips.pop() for _ in range(n_layers)][::-1]
            sample = _MotionUpBlock(
                ch, n_layers, heads[jdx] if cross else 0, tf_layers[jdx],
                cfg.use_linear_projection, motion, add_upsample=not last,
                groups=groups, dtype=self.dtype,
                name=f"up_blocks_{i}")(sample, list(block_skips), emb, ctx,
                                       refs=refs)

        sample = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype,
                              name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_out")(sample)
        return sample.reshape(b, t, hh, ww, cfg.out_channels)


class UNetMotionModel(PretrainedModel):
    config_class = UNetMotionConfig
    module_class = UNetMotionModule

    @classmethod
    def example_inputs(cls, config):
        s = 16
        ctx_dim = config.cross_attention_dim if isinstance(config.cross_attention_dim, int) \
            else config.cross_attention_dim[0]
        kwargs = {}
        if config.addition_embed_type == "text_time":
            text_dim = config.projection_class_embeddings_input_dim - \
                6 * config.addition_time_embed_dim
            kwargs["added_cond_kwargs"] = {
                "text_embeds": jnp.zeros((1, text_dim)),
                "time_ids": jnp.zeros((1, 6)),
            }
        return (jnp.zeros((1, min(config.num_frames, 4), s, s, config.in_channels)),
                jnp.asarray(0), jnp.zeros((1, 8, ctx_dim))), kwargs

    def load_motion_adapter(self, path_or_state_dict) -> int:
        """Load a diffusers-format AnimateDiff MotionAdapter state dict
        (reference unet_motion_model.py:448 from_unet2d(motion_adapter) +
        load_motion_modules:479) into this model's motion_modules params.
        Returns the number of tensors loaded."""
        from flax import traverse_util

        if isinstance(path_or_state_dict, dict):
            sd = path_or_state_dict
        else:
            from ...core.modeling import load_torch_bin

            sd = load_torch_bin(path_or_state_dict)

        renames = (
            (r"^(down_blocks|up_blocks)\.(\d+)\.", r"\1_\2."),
            (r"\.motion_modules\.(\d+)\.", r".motion_modules_\1."),
            (r"\.transformer_blocks\.(\d+)\.", r".transformer_blocks_\1."),
            (r"\.to_out\.0\.", r".to_out."),
            (r"\.ff\.net\.0\.", r".ff.net_0."),
            (r"\.ff\.net\.2\.", r".ff.net_2."),
            (r"(norm[0-9]*)\.weight$", r"\1.scale"),
            (r"\.weight$", r".kernel"),
        )
        flat = dict(traverse_util.flatten_dict(self.params))
        loaded = 0
        for k, v in sd.items():
            nk = k
            for pat, rep in renames:
                nk = re.sub(pat, rep, nk)
            keypath = tuple(nk.split("."))
            if keypath not in flat:
                continue
            arr = np.asarray(v)
            if nk.endswith(".kernel") and arr.ndim == 2:
                arr = arr.T
            if tuple(flat[keypath].shape) != tuple(arr.shape):
                continue
            flat[keypath] = jnp.asarray(arr, flat[keypath].dtype)
            loaded += 1
        if loaded == 0:
            raise ValueError("no motion-adapter tensors matched this model")
        self.params = traverse_util.unflatten_dict(flat)
        return loaded
