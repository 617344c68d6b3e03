"""Single-file Stable Diffusion checkpoint loading (reference
ppdiffusers/loaders/single_file.py + scripts/convert_diffusers_model/
convert_orig_sd_to_ppdiffusers.py): one original-LDM .safetensors/.ckpt ->
UNet + VAE + CLIP text encoder + pipeline.

Strategy: rename original LDM keys to the diffusers torch layout, then feed
each model's existing `from_state_dict` converter (which handles the
torch->flax transposes). SD 1.x layouts supported; SD2/SDXL single files
raise with a pointer to the per-component from_pretrained path."""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

SD15_UNET_CONFIG = dict(
    sample_size=64, in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D"),
    block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
    cross_attention_dim=768, attention_head_dim=8,
)

SD15_VAE_CONFIG = dict(
    sample_size=512, in_channels=3, out_channels=3, latent_channels=4,
    down_block_types=("DownEncoderBlock2D",) * 4,
    up_block_types=("UpDecoderBlock2D",) * 4,
    block_out_channels=(128, 256, 512, 512), layers_per_block=2,
    scaling_factor=0.18215,
)


def _resnet_rename(key: str) -> str:
    for a, b in (("in_layers.0", "norm1"), ("in_layers.2", "conv1"),
                 ("emb_layers.1", "time_emb_proj"), ("out_layers.0", "norm2"),
                 ("out_layers.3", "conv2"), ("skip_connection", "conv_shortcut")):
        key = key.replace(a, b)
    return key


def convert_ldm_unet(flat: Dict[str, np.ndarray], layers_per_block: int = 2):
    """model.diffusion_model.* -> diffusers UNet2DConditionModel torch keys."""
    src = {k[len("model.diffusion_model."):]: v for k, v in flat.items()
           if k.startswith("model.diffusion_model.")}
    out: Dict[str, np.ndarray] = {}
    per = layers_per_block + 1
    for k, v in src.items():
        if k.startswith("time_embed.0."):
            out[k.replace("time_embed.0.", "time_embedding.linear_1.")] = v
        elif k.startswith("time_embed.2."):
            out[k.replace("time_embed.2.", "time_embedding.linear_2.")] = v
        elif k.startswith("label_emb.0.0."):
            out[k.replace("label_emb.0.0.", "add_embedding.linear_1.")] = v
        elif k.startswith("label_emb.0.2."):
            out[k.replace("label_emb.0.2.", "add_embedding.linear_2.")] = v
        elif k.startswith("input_blocks.0.0."):
            out[k.replace("input_blocks.0.0.", "conv_in.")] = v
        elif k.startswith("out.0."):
            out[k.replace("out.0.", "conv_norm_out.")] = v
        elif k.startswith("out.2."):
            out[k.replace("out.2.", "conv_out.")] = v
        elif k.startswith("input_blocks."):
            m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)", k)
            i, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            block, layer = (i - 1) // per, (i - 1) % per
            if layer == layers_per_block:  # downsampler
                out[f"down_blocks.{block}.downsamplers.0.conv." +
                    rest.replace("op.", "")] = v
            elif sub == 0:
                out[f"down_blocks.{block}.resnets.{layer}." + _resnet_rename(rest)] = v
            else:
                out[f"down_blocks.{block}.attentions.{layer}." + rest] = v
        elif k.startswith("middle_block."):
            m = re.match(r"middle_block\.(\d+)\.(.+)", k)
            sub, rest = int(m.group(1)), m.group(2)
            if sub == 0:
                out["mid_block.resnets.0." + _resnet_rename(rest)] = v
            elif sub == 1:
                out["mid_block.attentions.0." + rest] = v
            else:
                out["mid_block.resnets.1." + _resnet_rename(rest)] = v
        elif k.startswith("output_blocks."):
            m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)", k)
            i, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            block, layer = i // per, i % per
            if sub == 0:
                out[f"up_blocks.{block}.resnets.{layer}." + _resnet_rename(rest)] = v
            elif rest.startswith("conv.") and layer == per - 1:
                out[f"up_blocks.{block}.upsamplers.0." + rest] = v
            else:
                out[f"up_blocks.{block}.attentions.{layer}." + rest] = v
    return out


def _vae_attn_rename(rest: str, v):
    table = {"q.": "to_q.", "k.": "to_k.", "v.": "to_v.",
             "proj_out.": "to_out.", "norm.": "group_norm."}
    for a, b in table.items():
        if rest.startswith(a):
            rest = b + rest[len(a):]
            break
    # 1x1 conv attention weights -> linear
    if getattr(v, "ndim", 0) == 4:
        v = np.asarray(v)[:, :, 0, 0]
    return rest, v


def convert_ldm_vae(flat: Dict[str, np.ndarray]):
    src = {k[len("first_stage_model."):]: v for k, v in flat.items()
           if k.startswith("first_stage_model.")}
    ups = [int(m.group(1)) for k in src
           if (m := re.match(r"decoder\.up\.(\d+)\.", k))]
    n_up = max(ups) + 1 if ups else 4
    out: Dict[str, np.ndarray] = {}
    for k, v in src.items():
        nk = k
        m = re.match(r"(encoder|decoder)\.(.+)", k)
        if m:
            tower, rest = m.groups()
            if rest.startswith("down."):
                mm = re.match(r"down\.(\d+)\.(block|downsample)\.(.*)", rest)
                i, kind, tail = int(mm.group(1)), mm.group(2), mm.group(3)
                if kind == "block":
                    j, tail2 = tail.split(".", 1)
                    tail2 = tail2.replace("nin_shortcut", "conv_shortcut")
                    nk = f"{tower}.down_blocks.{i}.resnets.{j}.{tail2}"
                else:
                    nk = f"{tower}.down_blocks.{i}.downsamplers.0.{tail}"
            elif rest.startswith("up."):
                mm = re.match(r"up\.(\d+)\.(block|upsample)\.(.*)", rest)
                i, kind, tail = int(mm.group(1)), mm.group(2), mm.group(3)
                ri = n_up - 1 - i  # LDM up blocks are stored reversed
                if kind == "block":
                    j, tail2 = tail.split(".", 1)
                    tail2 = tail2.replace("nin_shortcut", "conv_shortcut")
                    nk = f"{tower}.up_blocks.{ri}.resnets.{j}.{tail2}"
                else:
                    nk = f"{tower}.up_blocks.{ri}.upsamplers.0.{tail}"
            elif rest.startswith("mid.block_1."):
                nk = f"{tower}.mid_block.resnets.0." + \
                    rest[len("mid.block_1."):].replace("nin_shortcut", "conv_shortcut")
            elif rest.startswith("mid.block_2."):
                nk = f"{tower}.mid_block.resnets.1." + \
                    rest[len("mid.block_2."):].replace("nin_shortcut", "conv_shortcut")
            elif rest.startswith("mid.attn_1."):
                tail, v = _vae_attn_rename(rest[len("mid.attn_1."):], v)
                nk = f"{tower}.mid_block.attentions.0.{tail}"
            elif rest.startswith("norm_out."):
                nk = f"{tower}.conv_norm_out." + rest[len("norm_out."):]
        out[nk] = v
    return out


def convert_ldm_clip(flat: Dict[str, np.ndarray]):
    out = {}
    for k, v in flat.items():
        if k.startswith("cond_stage_model.transformer."):
            out[k[len("cond_stage_model.transformer."):]] = v
    return out


def load_pipeline_from_single_file(path: str, pipeline_class=None,
                                   scheduler=None, tokenizer=None,
                                   dtype=None, unet_config: Optional[dict] = None,
                                   vae_config: Optional[dict] = None):
    """Build a StableDiffusionPipeline from one original-SD checkpoint file."""
    import jax.numpy as jnp

    from ..models.clip import CLIPTextConfig, CLIPTextModel
    from .models import (
        AutoencoderKL,
        AutoencoderKLConfig,
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )
    from .pipelines import StableDiffusionPipeline
    from .schedulers import PNDMScheduler

    dtype = dtype or jnp.float32
    from safetensors import safe_open

    flat = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            flat[k] = f.get_tensor(k)

    if unet_config is None:
        probe = flat.get("model.diffusion_model.input_blocks.1.1."
                         "transformer_blocks.0.attn2.to_k.weight")
        if probe is None or probe.shape[1] != 768:
            raise NotImplementedError(
                "only SD 1.x single-file checkpoints are supported; load SD2/SDXL "
                "components via their diffusers-layout from_pretrained directories")
        unet_config = SD15_UNET_CONFIG
    vae_config = vae_config or SD15_VAE_CONFIG

    lpb = unet_config.get("layers_per_block", 2)
    unet = UNet2DConditionModel.from_state_dict(
        UNet2DConditionConfig.from_dict(unet_config),
        convert_ldm_unet(flat, layers_per_block=lpb), dtype=dtype)
    vae = AutoencoderKL.from_state_dict(
        AutoencoderKLConfig.from_dict(vae_config),
        convert_ldm_vae(flat), dtype=dtype)
    clip_flat = convert_ldm_clip(flat)
    emb = clip_flat.get("text_model.embeddings.token_embedding.weight")
    text_cfg = CLIPTextConfig(vocab_size=emb.shape[0] if emb is not None else 49408,
                              hidden_size=768, intermediate_size=3072,
                              num_hidden_layers=12, num_attention_heads=12,
                              max_position_embeddings=77)
    text_encoder = CLIPTextModel.from_state_dict(text_cfg, clip_flat, dtype=dtype)
    if tokenizer is None:
        raise ValueError(
            "single-file checkpoints carry no tokenizer; pass tokenizer= "
            "(e.g. CLIPTokenizer.from_pretrained(<sd-repo>, subfolder='tokenizer'))")
    cls = pipeline_class or StableDiffusionPipeline
    return cls(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
               unet=unet, scheduler=scheduler or PNDMScheduler(
                   beta_schedule="scaled_linear", beta_start=0.00085,
                   beta_end=0.012, skip_prk_steps=True))
