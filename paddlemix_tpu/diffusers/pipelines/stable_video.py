"""Image-to-video pipelines.

- StableVideoDiffusionPipeline: the real SVD stack (reference
  ppdiffusers/pipelines/stable_video_diffusion/
  pipeline_stable_video_diffusion.py) — spatio-temporal UNet, temporal-decoder
  VAE, per-frame guidance-scale ramp, (fps, motion_bucket, noise_aug)
  conditioning; the whole denoise loop is one jitted fori_loop.
- ImageToVideoPipeline: lighter motion-UNet variant (reference img_to_video)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class StableVideoDiffusionPipeline(DiffusionPipeline):
    """image -> video with the spatio-temporal UNet (SVD).

    Conditioning (reference pipeline_stable_video_diffusion.py:416-540):
    CLIP image embedding as cross-attn context, noise-augmented VAE image
    latent concatenated to every frame's channels, added_time_ids =
    (fps - 1, motion_bucket_id, noise_aug_strength), and CFG with a per-frame
    guidance ramp linspace(min_guidance, max_guidance, num_frames)."""

    def __init__(self, vae, image_encoder, unet, scheduler, feature_extractor=None):
        self.register_modules(vae=vae, image_encoder=image_encoder, unet=unet,
                              scheduler=scheduler, feature_extractor=feature_extractor)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def __call__(self, image, num_frames: Optional[int] = None,
                 num_inference_steps: int = 25, min_guidance_scale: float = 1.0,
                 max_guidance_scale: float = 3.0, fps: int = 7,
                 motion_bucket_id: int = 127, noise_aug_strength: float = 0.02,
                 seed: int = 0, output_type: str = "np"):
        num_frames = num_frames or self.unet.config.num_frames
        do_cfg = max_guidance_scale > 1.0
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 127.5 - 1.0
        if img.ndim == 3:
            img = img[None]
        px = jnp.asarray(img)
        batch = px.shape[0]
        key = jax.random.PRNGKey(seed)
        k_lat, k_aug = jax.random.split(key)

        # conditioning 1: CLIP image embedding as cross-attn context
        if self.image_encoder is not None:
            ctx = self.image_encoder.encode_image(px)[:, None, :]
        else:
            d = self.unet.config.cross_attention_dim
            ctx = jnp.zeros((batch, 1, d))
        context = jnp.concatenate([jnp.zeros_like(ctx), ctx]) if do_cfg else ctx

        # conditioning 2: noise-augmented VAE latent of the image, per frame
        aug = px + noise_aug_strength * jax.random.normal(k_aug, px.shape, px.dtype)
        cond_lat = self.vae.encode(aug.astype(self.vae.dtype)).mode().astype(jnp.float32)
        h, w = cond_lat.shape[1:3]
        cond_frames = jnp.broadcast_to(cond_lat[:, None],
                                       (batch, num_frames, h, w, cond_lat.shape[-1]))
        if do_cfg:
            cond_frames = jnp.concatenate([jnp.zeros_like(cond_frames), cond_frames])

        added_time_ids = jnp.asarray(
            [[fps - 1, motion_bucket_id, noise_aug_strength]] * batch, jnp.float32)
        if do_cfg:
            added_time_ids = jnp.concatenate([added_time_ids, added_time_ids])

        lat_ch = self.unet.config.in_channels - cond_lat.shape[-1]
        shape = (batch, num_frames, h, w, lat_ch)
        latents = jax.random.normal(k_lat, shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma

        # per-frame guidance ramp (B, F, 1, 1, 1)
        gs = jnp.linspace(min_guidance_scale, max_guidance_scale, num_frames)
        gs = jnp.broadcast_to(gs[None], (batch, num_frames))[..., None, None, None]

        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, cond_frames, context, added_time_ids,
                        state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    lat_in = jnp.concatenate([lat_in.astype(jnp.float32),
                                              cond_frames], axis=-1)
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t,
                        context.astype(unet.dtype),
                        added_time_ids.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        cache_key = ("svd_st", shape, num_inference_steps, do_cfg)
        latents = self._jit.get(cache_key, build)(
            self.unet.params, latents, cond_frames, context, added_time_ids,
            state, gs.astype(jnp.float32))
        if output_type == "latent":
            return (latents,)
        flat = latents.reshape(batch * num_frames, h, w, lat_ch)
        flat = flat / self.vae.config.scaling_factor
        frames = self.vae.decode(flat.astype(self.vae.dtype),
                                 num_frames=num_frames).astype(jnp.float32)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(batch, num_frames, *frames.shape[1:]),)


@register_pipeline
class ImageToVideoPipeline(DiffusionPipeline):
    def __init__(self, vae, image_encoder, unet, scheduler, feature_extractor=None):
        self.register_modules(vae=vae, image_encoder=image_encoder, unet=unet,
                              scheduler=scheduler, feature_extractor=feature_extractor)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def __call__(self, image, num_frames: int = 14, num_inference_steps: int = 25,
                 guidance_scale: float = 3.0, seed: int = 0, output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 127.5 - 1.0
        if img.ndim == 3:
            img = img[None]
        px = jnp.asarray(img)
        batch = px.shape[0]

        # conditioning 1: CLIP image embedding as context
        if self.image_encoder is not None:
            ctx = self.image_encoder.encode_image(px)[:, None, :]
        else:
            ctx_dim = self.unet.config.cross_attention_dim
            ctx = jnp.zeros((batch, 1, ctx_dim if isinstance(ctx_dim, int) else ctx_dim[0]))
        uncond_ctx = jnp.zeros_like(ctx)
        context = jnp.concatenate([uncond_ctx, ctx]) if do_cfg else ctx

        # conditioning 2: image latent concatenated per frame
        cond_lat = self.vae.encode(px.astype(self.vae.dtype)).mode().astype(jnp.float32)
        cond_lat = cond_lat * self.vae.config.scaling_factor
        lat_ch = self.unet.config.in_channels - cond_lat.shape[-1]
        h, w = cond_lat.shape[1:3]
        shape = (batch, num_frames, h, w, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        cond_frames = jnp.broadcast_to(cond_lat[:, None], (batch, num_frames, h, w,
                                                           cond_lat.shape[-1]))
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, cond_frames, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    cf = jnp.concatenate([jnp.zeros_like(cond_frames), cond_frames]) \
                        if do_cfg else cond_frames
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    lat_in = jnp.concatenate([lat_in, cf], axis=-1)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply({"params": params}, lat_in.astype(unet.dtype),
                                             t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return out

            return jax.jit(denoise)

        key = ("svd", shape, num_inference_steps, do_cfg)
        latents = self._jit.get(key, build)(
            self.unet.params, latents, cond_frames, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        flat = latents.reshape(batch * num_frames, h, w, lat_ch) / self.vae.config.scaling_factor
        frames = self.vae.decode(flat.astype(self.vae.dtype)).astype(jnp.float32)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(batch, num_frames, *frames.shape[1:]),)
