"""Paint-by-Example (reference
ppdiffusers/pipelines/paint_by_example/pipeline_paint_by_example.py):
example-image-guided inpainting. The 9-channel UNet sees
[latents | masked-image latents | downsampled mask]; conditioning is the CLIP
image embedding of the EXAMPLE image (one token) instead of text."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class PaintByExamplePipeline(DiffusionPipeline):
    def __init__(self, vae, image_encoder, unet, scheduler,
                 feature_extractor=None, safety_checker=None):
        self.register_modules(vae=vae, image_encoder=image_encoder, unet=unet,
                              scheduler=scheduler,
                              feature_extractor=feature_extractor)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    @staticmethod
    def _to_jnp_image(image):
        img = jnp.asarray(np.asarray(image, np.float32))
        if img.max() > 1.5:
            img = img / 127.5 - 1.0
        if img.ndim == 3:
            img = img[None]
        return img

    def __call__(self, example_image, image, mask_image,
                 num_inference_steps: int = 50, guidance_scale: float = 5.0,
                 seed: int = 0, output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        img = self._to_jnp_image(image)
        example = self._to_jnp_image(example_image)
        mask = jnp.asarray(np.asarray(mask_image, np.float32))
        if mask.ndim == 2:
            mask = mask[None, :, :, None]
        elif mask.ndim == 3:
            mask = mask[None] if mask.shape[-1] in (1, 3) else mask[..., None]
        mask = (mask[..., :1] > 0.5).astype(jnp.float32)  # 1 = paint here

        # conditioning: one CLIP image token from the example
        ctx = self.image_encoder.encode_image(example)[:, None, :]
        context = jnp.concatenate([jnp.zeros_like(ctx), ctx]) if do_cfg else ctx

        # masked-image latents + downsampled mask
        masked = img * (1.0 - mask)
        masked_lat = self.vae.encode(masked.astype(self.vae.dtype)).mode()
        masked_lat = masked_lat.astype(jnp.float32) * self.vae.config.scaling_factor
        b, h, w, lc = masked_lat.shape
        mask_lat = jax.image.resize(mask, (b, h, w, 1), "nearest")
        # reference channel order: [latents, mask, masked_image_latents]
        cond_channels = jnp.concatenate([mask_lat, masked_lat], axis=-1)
        if do_cfg:
            cond_channels = jnp.concatenate([cond_channels, cond_channels])

        shape = (b, h, w, lc)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, cond_channels, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    lat_in = jnp.concatenate([lat_in, cond_channels], axis=-1)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("pbe", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, cond_channels, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        out = np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1))
        return (out,)
