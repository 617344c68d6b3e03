"""AnimateAnyone: pose-driven character animation.

Rebuild of the reference's AnimateAnyone stack (ppdiffusers/models/
animate_anyone/: pose_guider.py PoseGuider, mutual_self_attention.py
ReferenceAttentionControl, unet_3d.py; examples/AnimateAnyone/src/trainer/
model.py wires reference_unet + denoising_unet + pose_guider):

- PoseGuider: per-frame conv encoder of the pose skeleton video, zero-init
  output conv, feature added after the denoising UNet's conv_in.
- ReferenceNet "write": the plain 2D SD UNet runs once on the reference
  image latent; every spatial transformer block's pre-attn1 hidden state is
  captured. TPU twist: instead of the reference's stateful
  ReferenceAttentionControl monkey-patching, capture is functional — flax
  ``capture_intermediates`` on the norm1 LayerNorms, flattened in the same
  canonical traversal order (down asc -> mid -> up asc) the consumer uses.
- "read": the motion UNet's spatial self-attention extends K/V over the
  captured features (extra_kv threading in attention.py/unet_motion.py).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel


@dataclasses.dataclass
class PoseGuiderConfig(BaseConfig):
    model_type = "pose_guider"
    conditioning_embedding_channels: int = 320
    conditioning_channels: int = 3
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)


class PoseGuiderModule(nn.Module):
    """reference pose_guider.py: conv_in -> [conv3x3, conv3x3 stride2]* ->
    zero conv_out. InflatedConv3d == per-frame 2D conv, so frames fold into
    the batch."""

    config: PoseGuiderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conditioning):
        cfg = self.config
        squeeze = conditioning.ndim == 5
        if squeeze:
            b, t, h, w, c = conditioning.shape
            x = conditioning.reshape(b * t, h, w, c)
        else:
            x = conditioning
        chans = cfg.block_out_channels
        x = nn.Conv(chans[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        x = nn.silu(x)
        for i in range(len(chans) - 1):
            x = nn.Conv(chans[i], (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(chans[i + 1], (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        out = nn.Conv(cfg.conditioning_embedding_channels, (3, 3),
                      padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="conv_out")(x)
        if squeeze:
            return out.reshape(b, t, *out.shape[1:])
        return out


class PoseGuider(PretrainedModel):
    config_class = PoseGuiderConfig
    module_class = PoseGuiderModule

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.block_out_channels) - 1)
        return ((jnp.zeros((1, 8 * f, 8 * f,
                            config.conditioning_channels)),), {})


def _path_sort_key(path: Tuple[str, ...]):
    """Canonical traversal order of a UNet's transformer norm1 sites:
    down blocks ascending, mid, up blocks ascending; within a block by
    attentions index then transformer_blocks index."""
    top = path[0]
    m = re.match(r"(down|mid|up)_block[s]?_?(\d*)", top)
    group = {"down": 0, "mid": 1, "up": 2}[m.group(1)]
    block = int(m.group(2) or 0)
    att = layer = 0
    for p in path[1:]:
        if p.startswith("attentions_"):
            att = int(p.split("_")[-1])
        if p.startswith("transformer_blocks_"):
            layer = int(p.split("_")[-1])
    return (group, block, att, layer)


def extract_reference_features(unet2d, latents, timestep, context) -> List:
    """Run the 2-D reference UNet, returning every spatial transformer
    block's pre-attn1 normed hidden state in canonical traversal order
    (the "write" pass of ReferenceAttentionControl)."""

    def is_attn1_norm(mdl, method_name):
        return isinstance(mdl, nn.LayerNorm) and mdl.name == "norm1" \
            and any(str(p).startswith("transformer_blocks")
                    for p in mdl.path)

    _, state = unet2d.module.apply(
        {"params": unet2d.params}, latents.astype(unet2d.dtype),
        timestep, context.astype(unet2d.dtype),
        capture_intermediates=is_attn1_norm)
    inter = state["intermediates"]
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    named = []
    for keypath, value in flat:
        path = tuple(getattr(k, "key", str(k)) for k in keypath)
        # making "intermediates" mutable also collects attn2's sown
        # cross_attn_probs (the attend-and-excite capture) — keep only the
        # norm1 call outputs
        if "norm1" not in path:
            continue
        named.append((tuple(p for p in path if p not in ("__call__",)), value))
    named.sort(key=lambda kv: _path_sort_key(kv[0]))
    return [v for _, v in named]


def tile_reference_features(features: Sequence, num_frames: int) -> List:
    """(B, N, C) reference features -> (B*T, N, C) for the flattened-frame
    motion UNet."""
    return [jnp.repeat(f, num_frames, axis=0) for f in features]


class AnimateAnyonePipeline:
    """pose sequence + reference image -> video frames (reference
    examples/AnimateAnyone/src/pipelines/pipeline_pose2vid_long.py, short
    single-context variant).

    Components: vae, image_encoder (CLIP vision -> 1 context token),
    reference_unet (2D SD UNet), denoising_unet (UNetMotionModel),
    pose_guider, scheduler."""

    def __init__(self, vae, image_encoder, reference_unet, denoising_unet,
                 pose_guider, scheduler):
        self.vae = vae
        self.image_encoder = image_encoder
        self.reference_unet = reference_unet
        self.denoising_unet = denoising_unet
        self.pose_guider = pose_guider
        self.scheduler = scheduler
        self.vae_scale_factor = 2 ** (
            len(vae.config.block_out_channels) - 1) if vae else 8

    def __call__(self, ref_image, pose_images, height: int, width: int,
                 num_inference_steps: int = 25, guidance_scale: float = 3.5,
                 seed: int = 0, output_type: str = "np"):
        from ..pipelines.pipeline_utils import make_scheduler_state

        t_frames = len(pose_images)
        ref = jnp.asarray(ref_image, jnp.float32)[None]
        # CLIP image embedding as the single cross-attention token
        clip_emb = self.image_encoder.encode_image(ref)
        ctx_cond = clip_emb[:, None]
        ctx_uncond = jnp.zeros_like(ctx_cond)
        do_cfg = guidance_scale > 1.0

        # reference latent through the VAE encoder (mode, not sample)
        ref_lat = self.vae.encode(ref * 2.0 - 1.0).mode() \
            * self.vae.config.scaling_factor
        poses = jnp.asarray(np.stack(pose_images), jnp.float32)[None]

        # "write": run the reference unet once at t=0 per CFG branch
        refs_c = extract_reference_features(
            self.reference_unet, ref_lat, jnp.asarray(0), ctx_cond)
        refs_u = extract_reference_features(
            self.reference_unet, ref_lat, jnp.asarray(0), ctx_uncond)
        refs = [jnp.concatenate([u, c]) if do_cfg else c
                for u, c in zip(refs_u, refs_c)]
        refs = tile_reference_features(refs, t_frames)

        pose_fea = self.pose_guider(poses)
        pose_in = jnp.concatenate([pose_fea, pose_fea]) if do_cfg else pose_fea
        context = jnp.concatenate([ctx_uncond, ctx_cond]) if do_cfg \
            else ctx_cond

        lat_ch = self.denoising_unet.config.in_channels
        shape = (1, t_frames, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.denoising_unet, self.scheduler

        @jax.jit
        def denoise(params, latents, context, pose_in, state, gs, *refs):
            def body(i, carry):
                latents, state = carry
                t = state.timesteps[i]
                lat_in = jnp.concatenate([latents, latents]) if do_cfg \
                    else latents
                lat_in = scheduler.scale_model_input(state, lat_in, i)
                pred = unet.module.apply(
                    {"params": params}, lat_in.astype(unet.dtype), t,
                    context.astype(unet.dtype),
                    reference_features=list(refs),
                    pose_cond=pose_in).astype(jnp.float32)
                if do_cfg:
                    un, co = jnp.split(pred, 2)
                    pred = un + gs * (co - un)
                latents, state = scheduler.step(state, pred, i, latents)
                return latents, state

            out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                       (latents, state))
            return out

        latents = denoise(unet.params, latents, context, pose_in, state,
                          jnp.asarray(guidance_scale, jnp.float32), *refs)
        if output_type == "latent":
            return (latents,)
        flat = latents.reshape(-1, *latents.shape[2:])
        frames = self.vae.decode(flat / self.vae.config.scaling_factor)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(1, t_frames, *frames.shape[1:]),)
