"""UNet2DConditionModel (SD1.5 / SD2 / SDXL), TPU-native NHWC.

Rebuild of the reference's conditional UNet
(ppdiffusers/ppdiffusers/models/unet_2d_condition.py, 1207 LoC +
unet_2d_blocks.py): same config surface as diffusers so real SD/SDXL
checkpoints load directly; layout is NHWC and attention rides the Pallas
flash kernel. Param names mirror torch keys modulo `.N.` -> `_N.` so key
conversion stays a regex rename."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .attention import Transformer2DModel
from .embeddings import TimestepEmbedding, Timesteps
from .resnet import Downsample2D, GroupNormAct, ResnetBlock2D, Upsample2D


@dataclasses.dataclass
class UNet2DConditionConfig(BaseConfig):
    model_type = "unet_2d_condition"
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D")
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: Union[int, Tuple[int, ...]] = 768
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None
    transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    addition_embed_type: Optional[str] = None  # "text_time" (SDXL) | "image" (Kandinsky)
    # class conditioning: learned table (DiT-style) or "timestep" (the SD x4
    # upscaler feeds the noise level through a second timestep embedding)
    num_class_embeds: Optional[int] = None
    class_embed_type: Optional[str] = None
    addition_time_embed_dim: Optional[int] = None
    projection_class_embeddings_input_dim: Optional[int] = None
    encoder_hid_dim_type: Optional[str] = None  # "image_proj" for Kandinsky
    encoder_hid_dim: Optional[int] = None       # image embed dim (e.g. 1280)
    # IP-Adapter: trailing tokens of encoder_hidden_states are image tokens
    # attended through decoupled to_k_ip/to_v_ip projections
    ip_adapter_tokens: int = 0
    ip_adapter_scale: float = 1.0
    center_input_sample: bool = False
    # inference fast path: int8 a8w8 matmuls/convs + ToMe token merging in the
    # self-attention blocks (reference counterparts: triton weight_only_int8 /
    # INFERENCE_OPTIMIZE simplified_sd3.py and tomesd_patch_utils.py)
    quant: Optional[str] = None
    tome_ratio: float = 0.0
    attention_type: str = "default"  # "gated" = GLIGEN grounded generation
    # rematerialize each down/mid/up block in backward (reference
    # enable_gradient_checkpointing / recompute): jax.checkpoint per block
    gradient_checkpointing: bool = False

    def _per_block(self, v):
        n = len(self.block_out_channels)
        return tuple(v) if isinstance(v, (list, tuple)) else (v,) * n

    @property
    def heads_per_block(self):
        # diffusers quirk: attention_head_dim historically stored num heads
        if self.num_attention_heads is not None:
            return self._per_block(self.num_attention_heads)
        return self._per_block(self.attention_head_dim)

    @property
    def tf_layers_per_block(self):
        return self._per_block(self.transformer_layers_per_block)


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    tf_layers: int
    use_linear_projection: bool
    add_downsample: bool = True
    groups: int = 32
    ip_tokens: int = 0
    ip_scale: float = 1.0
    quant: Optional[str] = None
    tome_ratio: float = 0.0
    attention_type: str = "default"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, extra_residual=None, gligen_objs=None,
                 refs=None):
        outputs = []
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups, quant=self.quant,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(self.num_heads, head_dim, num_layers=self.tf_layers,
                                   use_linear_projection=self.use_linear_projection,
                                   groups=self.groups, ip_tokens=self.ip_tokens,
                                   ip_scale=self.ip_scale, quant=self.quant,
                                   tome_ratio=self.tome_ratio,
                                   attention_type=self.attention_type,
                                   dtype=self.dtype,
                                   name=f"attentions_{i}")(x, context,
                                                           gligen_objs=gligen_objs,
                                                           extra_kv=refs.pop(0) if refs else None)
            if extra_residual is not None and i == self.num_layers - 1:
                # T2I-Adapter intrablock residual (reference unet_2d_condition
                # down_intrablock_additional_residuals: after the last
                # resnet+attn, before downsampling)
                x = x + extra_residual.astype(x.dtype)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, quant=self.quant, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool = True
    groups: int = 32
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, extra_residual=None):
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups, quant=self.quant,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if extra_residual is not None and i == self.num_layers - 1:
                x = x + extra_residual.astype(x.dtype)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, quant=self.quant, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    num_heads: int
    tf_layers: int
    use_linear_projection: bool
    groups: int = 32
    ip_tokens: int = 0
    ip_scale: float = 1.0
    quant: Optional[str] = None
    tome_ratio: float = 0.0
    attention_type: str = "default"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, gligen_objs=None, refs=None):
        head_dim = self.channels // self.num_heads
        x = ResnetBlock2D(self.channels, groups=self.groups, quant=self.quant,
                          dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(self.num_heads, head_dim, num_layers=self.tf_layers,
                               use_linear_projection=self.use_linear_projection,
                               groups=self.groups, ip_tokens=self.ip_tokens,
                               ip_scale=self.ip_scale, quant=self.quant,
                               tome_ratio=self.tome_ratio,
                               attention_type=self.attention_type,
                               # SAG hook: the mid-block self-attn map is the
                               # smallest (cheap) and the one the reference
                               # pipeline reads; sown only under
                               # mutable=["intermediates"] so ordinary calls
                               # pay nothing
                               capture_self_probs=True,
                               dtype=self.dtype,
                               name="attentions_0")(x, context,
                                                    gligen_objs=gligen_objs,
                                                    extra_kv=refs.pop(0) if refs else None)
        x = ResnetBlock2D(self.channels, groups=self.groups, quant=self.quant,
                          dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    tf_layers: int
    use_linear_projection: bool
    add_upsample: bool = True
    groups: int = 32
    ip_tokens: int = 0
    ip_scale: float = 1.0
    quant: Optional[str] = None
    tome_ratio: float = 0.0
    attention_type: str = "default"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, gligen_objs=None, refs=None):
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups, quant=self.quant,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(self.num_heads, head_dim, num_layers=self.tf_layers,
                                   use_linear_projection=self.use_linear_projection,
                                   groups=self.groups, ip_tokens=self.ip_tokens,
                                   ip_scale=self.ip_scale, quant=self.quant,
                                   tome_ratio=self.tome_ratio,
                                   attention_type=self.attention_type,
                                   dtype=self.dtype,
                                   name=f"attentions_{i}")(x, context,
                                                           gligen_objs=gligen_objs,
                                                           extra_kv=refs.pop(0) if refs else None)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, quant=self.quant, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool = True
    groups: int = 32
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups, quant=self.quant,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, quant=self.quant, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UNet2DConditionModule(nn.Module):
    config: UNet2DConditionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 added_cond_kwargs=None, class_labels=None,
                 down_block_additional_residuals=None,
                 mid_block_additional_residual=None,
                 down_intrablock_additional_residuals=None,
                 gligen_objs=None, reference_features=None):
        cfg = self.config
        groups = cfg.norm_num_groups
        if cfg.center_input_sample:
            sample = 2.0 * sample - 1.0
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))

        # time embedding
        time_embed_dim = cfg.block_out_channels[0] * 4
        t_emb = Timesteps(cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)(timestep)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))

        if class_labels is not None and cfg.class_embed_type == "timestep":
            c_emb = Timesteps(cfg.block_out_channels[0], cfg.flip_sin_to_cos,
                              cfg.freq_shift)(class_labels)
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                          name="class_embedding")(
                c_emb.astype(self.dtype))
        elif class_labels is not None and cfg.class_embed_type == "projection":
            # stable-unclip: a continuous conditioning vector (noised CLIP
            # image embedding + noise-level embedding) projected like a
            # timestep (reference unet_2d_condition.py class_embed_type
            # "projection")
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                          name="class_embedding")(
                class_labels.astype(self.dtype))
        elif class_labels is not None and cfg.num_class_embeds:
            emb = emb + nn.Embed(cfg.num_class_embeds, time_embed_dim,
                                 dtype=self.dtype,
                                 name="class_embedding")(class_labels)

        # SDXL micro-conditioning (text_embeds + time_ids)
        if cfg.addition_embed_type == "text_time":
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = Timesteps(cfg.addition_time_embed_dim, cfg.flip_sin_to_cos,
                                    cfg.freq_shift)(time_ids.reshape(-1))
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1)
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                          name="add_embedding")(add_embeds.astype(self.dtype))
        elif cfg.addition_embed_type == "image":
            # Kandinsky 2.2: CLIP image embedding added to the time embedding
            image_embeds = added_cond_kwargs["image_embeds"]
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                          name="add_embedding")(image_embeds.astype(self.dtype))
        if cfg.encoder_hid_dim_type == "image_proj":
            # cross-attention context projected from the image embedding
            image_embeds = added_cond_kwargs["image_embeds"]
            ctx_dim = cfg.cross_attention_dim if isinstance(cfg.cross_attention_dim, int) \
                else cfg.cross_attention_dim[0]
            n_ctx = 4
            proj = nn.Dense(n_ctx * ctx_dim, dtype=self.dtype,
                            name="encoder_hid_proj")(image_embeds.astype(self.dtype))
            encoder_hidden_states = proj.reshape(image_embeds.shape[0], n_ctx, ctx_dim)

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_in")(sample)

        heads = cfg.heads_per_block
        tf_layers = cfg.tf_layers_per_block

        def maybe_remat(block_fn):
            # reference enable_gradient_checkpointing: remat each block
            if not cfg.gradient_checkpointing:
                return block_fn
            return nn.remat(block_fn, prevent_cse=False)

        skips = [sample]
        # reference-only attention: features consumed positionally in
        # traversal order (down asc -> mid -> up asc), matching
        # extract_reference_features (animate_anyone.py)
        refs = list(reference_features) if reference_features is not None \
            else None
        intra = down_intrablock_additional_residuals
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            last = i == len(cfg.down_block_types) - 1
            extra = intra[i] if intra is not None and i < len(intra) else None
            if block_type == "CrossAttnDownBlock2D":
                blk = CrossAttnDownBlock2D(
                    ch, cfg.layers_per_block, heads[i], tf_layers[i],
                    cfg.use_linear_projection, add_downsample=not last, groups=groups,
                    ip_tokens=cfg.ip_adapter_tokens, ip_scale=cfg.ip_adapter_scale,
                    quant=cfg.quant, tome_ratio=cfg.tome_ratio,
                    attention_type=cfg.attention_type,
                    dtype=self.dtype, name=f"down_blocks_{i}")
                sample, outs = maybe_remat(
                    lambda m, s, e, c, x: m(s, e, c, extra_residual=x,
                                            gligen_objs=gligen_objs,
                                            refs=refs))(
                    blk, sample, emb, encoder_hidden_states, extra)
            else:
                blk = DownBlock2D(ch, cfg.layers_per_block, add_downsample=not last,
                                  groups=groups, quant=cfg.quant, dtype=self.dtype,
                                  name=f"down_blocks_{i}")
                sample, outs = maybe_remat(
                    lambda m, s, e, x: m(s, e, extra_residual=x))(
                    blk, sample, emb, extra)
            skips.extend(outs)

        if down_block_additional_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_additional_residuals)]

        mid = UNetMidBlock2DCrossAttn(
            cfg.block_out_channels[-1], heads[-1], tf_layers[-1],
            cfg.use_linear_projection, groups=groups,
            ip_tokens=cfg.ip_adapter_tokens, ip_scale=cfg.ip_adapter_scale,
            quant=cfg.quant, tome_ratio=cfg.tome_ratio,
            attention_type=cfg.attention_type, dtype=self.dtype,
            name="mid_block")
        sample = maybe_remat(
            lambda m, s, e, c: m(s, e, c, gligen_objs=gligen_objs,
                                 refs=refs))(
            mid, sample, emb, encoder_hidden_states)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual

        for i, block_type in enumerate(cfg.up_block_types):
            rev = list(reversed(cfg.block_out_channels))
            ch = rev[i]
            j = len(cfg.block_out_channels) - 1 - i  # matching down index
            last = i == len(cfg.up_block_types) - 1
            n_layers = cfg.layers_per_block + 1
            block_skips = [skips.pop() for _ in range(n_layers)][::-1]
            block_skips = list(block_skips)
            if block_type == "CrossAttnUpBlock2D":
                blk = CrossAttnUpBlock2D(
                    ch, n_layers, heads[j], tf_layers[j], cfg.use_linear_projection,
                    add_upsample=not last, groups=groups,
                    ip_tokens=cfg.ip_adapter_tokens, ip_scale=cfg.ip_adapter_scale,
                    quant=cfg.quant, tome_ratio=cfg.tome_ratio,
                    attention_type=cfg.attention_type, dtype=self.dtype,
                    name=f"up_blocks_{i}")
                sample = maybe_remat(
                    lambda m, s, sk, e, c: m(s, sk, e, c,
                                             gligen_objs=gligen_objs,
                                             refs=refs))(
                    blk, sample, block_skips, emb, encoder_hidden_states)
            else:
                blk = UpBlock2D(ch, n_layers, add_upsample=not last, groups=groups,
                                quant=cfg.quant, dtype=self.dtype,
                                name=f"up_blocks_{i}")
                sample = maybe_remat(lambda m, s, sk, e: m(s, sk, e))(
                    blk, sample, block_skips, emb)

        sample = GroupNormAct(groups=groups, eps=1e-5, act="silu", dtype=self.dtype,
                              name="conv_norm_out")(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv_out")(sample)
        return sample


_UNET_KEY_MAP = (
    (r"\.to_out\.0\.", r".to_out."),
    (r"\.net\.0\.", r".net_0."),
    (r"\.net\.2\.", r".net_2."),
    (r"\.(\d+)\.", r"_\1."),
    (r"(^|\.)((conv_)?norm[^.]*|group_norm)\.weight$", r"\1\2.scale"),
    (r"\.weight$", r".kernel"),
)


class UNet2DConditionModel(PretrainedModel):
    config_class = UNet2DConditionConfig
    module_class = UNet2DConditionModule
    torch_key_map = _UNET_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        s = min(config.sample_size, 16)  # init shapes don't bind spatial dims
        ctx_dim = config.cross_attention_dim if isinstance(config.cross_attention_dim, int) \
            else config.cross_attention_dim[0]
        kwargs = {}
        if config.addition_embed_type == "text_time":
            # projection_class_embeddings_input_dim = text_embed_dim + 6*addition_time_embed_dim
            text_dim = config.projection_class_embeddings_input_dim - 6 * config.addition_time_embed_dim
            kwargs["added_cond_kwargs"] = {
                "text_embeds": jnp.zeros((1, text_dim)),
                "time_ids": jnp.zeros((1, 6)),
            }
        elif config.addition_embed_type == "image":
            kwargs["added_cond_kwargs"] = {
                "image_embeds": jnp.zeros((1, config.encoder_hid_dim or 1280)),
            }
        if config.class_embed_type == "projection":
            kwargs["class_labels"] = jnp.zeros(
                (1, config.projection_class_embeddings_input_dim))
        elif config.num_class_embeds or config.class_embed_type == "timestep":
            kwargs["class_labels"] = jnp.zeros((1,), jnp.int32)
        if config.attention_type == "gated":
            kwargs["gligen_objs"] = jnp.zeros((1, 4, ctx_dim))
        return (jnp.zeros((1, s, s, config.in_channels)), jnp.asarray(0),
                jnp.zeros((1, 8, ctx_dim))), kwargs
