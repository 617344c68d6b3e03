"""ControlNet (reference ppdiffusers/ppdiffusers/models/controlnet.py):
a copy of the UNet's encoder half with zero-initialized output convs plus a
conditioning-image embedder; outputs per-skip residuals + a mid residual."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.modeling import PretrainedModel
from .embeddings import TimestepEmbedding, Timesteps
from .unet_2d_condition import (
    CrossAttnDownBlock2D,
    DownBlock2D,
    UNet2DConditionConfig,
    UNetMidBlock2DCrossAttn,
    _UNET_KEY_MAP,
)


@dataclasses.dataclass
class ControlNetConfig(UNet2DConditionConfig):
    model_type = "controlnet"
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)


class ControlNetConditioningEmbedding(nn.Module):
    """Encode the control image (full res) down to latent resolution."""

    out_channels: int
    block_channels: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        x = nn.Conv(self.block_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(self.block_channels) - 1):
            x = nn.Conv(self.block_channels[i], (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="conv_out")(x)


class ControlNetModule(nn.Module):
    config: ControlNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states, controlnet_cond,
                 conditioning_scale: float = 1.0, added_cond_kwargs=None):
        cfg = self.config
        groups = cfg.norm_num_groups
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))
        time_embed_dim = cfg.block_out_channels[0] * 4
        t_emb = Timesteps(cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)(timestep)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time" and added_cond_kwargs is not None:
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = Timesteps(cfg.addition_time_embed_dim, cfg.flip_sin_to_cos,
                                    cfg.freq_shift)(time_ids.reshape(-1))
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1)
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                          name="add_embedding")(add_embeds.astype(self.dtype))

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_in")(sample)
        cond = ControlNetConditioningEmbedding(
            cfg.block_out_channels[0], cfg.conditioning_embedding_out_channels,
            dtype=self.dtype, name="controlnet_cond_embedding")(controlnet_cond)
        sample = sample + cond

        heads = cfg.heads_per_block
        tf_layers = cfg.tf_layers_per_block
        skips = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            last = i == len(cfg.down_block_types) - 1
            if block_type == "CrossAttnDownBlock2D":
                sample, outs = CrossAttnDownBlock2D(
                    ch, cfg.layers_per_block, heads[i], tf_layers[i],
                    cfg.use_linear_projection, add_downsample=not last, groups=groups,
                    dtype=self.dtype, name=f"down_blocks_{i}")(sample, emb, encoder_hidden_states)
            else:
                sample, outs = DownBlock2D(ch, cfg.layers_per_block, add_downsample=not last,
                                           groups=groups, dtype=self.dtype,
                                           name=f"down_blocks_{i}")(sample, emb)
            skips.extend(outs)

        sample = UNetMidBlock2DCrossAttn(
            cfg.block_out_channels[-1], heads[-1], tf_layers[-1],
            cfg.use_linear_projection, groups=groups, dtype=self.dtype,
            name="mid_block")(sample, emb, encoder_hidden_states)

        down_res = []
        for i, skip in enumerate(skips):
            r = nn.Conv(skip.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f"controlnet_down_blocks_{i}")(skip)
            down_res.append(r * conditioning_scale)
        mid_res = nn.Conv(sample.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="controlnet_mid_block")(sample)
        return tuple(down_res), mid_res * conditioning_scale


_CONTROLNET_KEY_MAP = (
    (r"\.controlnet_down_blocks\.(\d+)\.", r".controlnet_down_blocks_\1."),
    (r"^controlnet_down_blocks\.(\d+)\.", r"controlnet_down_blocks_\1."),
    (r"\.conditioning_embedding\.", r".controlnet_cond_embedding."),
) + _UNET_KEY_MAP


class ControlNetModel(PretrainedModel):
    config_class = ControlNetConfig
    module_class = ControlNetModule
    torch_key_map = _CONTROLNET_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        s = 16
        ctx_dim = config.cross_attention_dim if isinstance(config.cross_attention_dim, int) \
            else config.cross_attention_dim[0]
        factor = 2 ** (len(config.conditioning_embedding_out_channels) - 1)
        kwargs = {}
        if config.addition_embed_type == "text_time":
            # SDXL-flavored controlnet (InstantID): micro-conditioning embeds
            text_dim = config.projection_class_embeddings_input_dim \
                - 6 * config.addition_time_embed_dim
            kwargs["added_cond_kwargs"] = {
                "text_embeds": jnp.zeros((1, text_dim)),
                "time_ids": jnp.zeros((1, 6)),
            }
        return (jnp.zeros((1, s, s, config.in_channels)), jnp.asarray(0),
                jnp.zeros((1, 8, ctx_dim)),
                jnp.zeros((1, factor * s, factor * s, config.conditioning_channels))), kwargs
