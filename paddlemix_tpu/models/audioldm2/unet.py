"""AudioLDM2 UNet: each resnet layer is followed by one transformer stack per
entry in cross_attention_dim — None entries run double self-attention, index
<= 1 attends to the GPT-2 generated embeddings, index > 1 to the projected
CLAP/T5 sequence (reference pipelines/audioldm2/modeling_audioldm2.py:145-1360,
context routing at :1120-1135)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...diffusers.models.attention import Transformer2DModel
from ...diffusers.models.embeddings import TimestepEmbedding, Timesteps
from ...diffusers.models.resnet import Downsample2D, ResnetBlock2D, Upsample2D


@dataclasses.dataclass
class AudioLDM2UNetConfig(BaseConfig):
    model_type = "audioldm2-unet"
    sample_size: int = 128
    in_channels: int = 8
    out_channels: int = 8
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D")
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # one transformer stack per entry; None => double self-attention
    cross_attention_dim: Tuple[Optional[int], ...] = (None, 768)
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    transformer_layers_per_block: int = 1
    use_linear_projection: bool = False
    norm_num_groups: int = 32


def _route_context(idx, dim, generated, seq):
    """modeling_audioldm2.py context routing: idx<=1 -> generated GPT-2
    states; idx>1 -> projected encoder sequence; None-dim -> self."""
    if dim is None:
        return None
    return generated if idx <= 1 else seq


class _AttnStack(nn.Module):
    out_channels: int
    head_dim: int
    tf_layers: int
    use_linear_projection: bool
    cross_dims: Tuple[Optional[int], ...]
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, generated, seq, prefix=""):
        heads = self.out_channels // self.head_dim
        for j, dim in enumerate(self.cross_dims):
            ctx = _route_context(j, dim, generated, seq)
            x = Transformer2DModel(
                heads, self.head_dim, num_layers=self.tf_layers,
                use_linear_projection=self.use_linear_projection,
                groups=self.groups, dtype=self.dtype,
                name=f"{prefix}attn_{j}")(x, ctx)
        return x


class AudioLDM2UNetModule(nn.Module):
    config: AudioLDM2UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 encoder_hidden_states_1=None):
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        temb = Timesteps(cfg.block_out_channels[0])(timesteps)
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(temb.astype(self.dtype))
        generated = encoder_hidden_states
        seq = (encoder_hidden_states_1 if encoder_hidden_states_1 is not None
               else encoder_hidden_states)

        head_dim = cfg.attention_head_dim
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(sample)
        skips = [x]
        for bi, (btype, ch) in enumerate(zip(cfg.down_block_types,
                                             cfg.block_out_channels)):
            last = bi == len(cfg.block_out_channels) - 1
            for li in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"down_{bi}_res_{li}")(x, temb)
                if btype == "CrossAttnDownBlock2D":
                    hd = head_dim if isinstance(head_dim, int) else head_dim[bi]
                    x = _AttnStack(ch, hd, cfg.transformer_layers_per_block,
                                   cfg.use_linear_projection,
                                   cfg.cross_attention_dim, cfg.norm_num_groups,
                                   dtype=self.dtype,
                                   name=f"down_{bi}_l{li}")(x, generated, seq)
                skips.append(x)
            if not last:
                x = Downsample2D(ch, dtype=self.dtype, name=f"down_{bi}_ds")(x)
                skips.append(x)

        # mid
        ch = cfg.block_out_channels[-1]
        hd = head_dim if isinstance(head_dim, int) else head_dim[-1]
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_res_0")(x, temb)
        x = _AttnStack(ch, hd, cfg.transformer_layers_per_block,
                       cfg.use_linear_projection, cfg.cross_attention_dim,
                       cfg.norm_num_groups, dtype=self.dtype,
                       name="mid")(x, generated, seq)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_res_1")(x, temb)

        rev_ch = list(reversed(cfg.block_out_channels))
        for bi, btype in enumerate(cfg.up_block_types):
            ch = rev_ch[bi]
            last = bi == len(cfg.up_block_types) - 1
            for li in range(cfg.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"up_{bi}_res_{li}")(x, temb)
                if btype == "CrossAttnUpBlock2D":
                    hd = head_dim if isinstance(head_dim, int) else \
                        list(reversed(head_dim))[bi]
                    x = _AttnStack(ch, hd, cfg.transformer_layers_per_block,
                                   cfg.use_linear_projection,
                                   cfg.cross_attention_dim, cfg.norm_num_groups,
                                   dtype=self.dtype,
                                   name=f"up_{bi}_l{li}")(x, generated, seq)
            if not last:
                x = Upsample2D(ch, dtype=self.dtype, name=f"up_{bi}_us")(x)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class AudioLDM2UNet(PretrainedModel):
    config_class = AudioLDM2UNetConfig
    module_class = AudioLDM2UNetModule

    @classmethod
    def example_inputs(cls, config):
        r = 2 ** (len(config.block_out_channels) - 1)
        dims = [d for d in config.cross_attention_dim if d is not None]
        gen_dim = dims[0] if dims else 768
        seq_dim = dims[-1] if dims else 768
        return ((jnp.zeros((1, r * 2, r, config.in_channels)), jnp.zeros((1,)),
                 jnp.zeros((1, 8, gen_dim))),
                {"encoder_hidden_states_1": jnp.zeros((1, 8, seq_dim))})
