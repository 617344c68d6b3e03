"""SDXL img2img + inpaint (reference
ppdiffusers/pipelines/stable_diffusion_xl/pipeline_stable_diffusion_xl_img2img.py
+ _inpaint.py): the SDXL dual-encoder + micro-conditioning machinery composed
with the img2img strength-noising / inpaint known-region pinning loops."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionXLPipeline


@register_pipeline
class StableDiffusionXLImg2ImgPipeline(StableDiffusionXLPipeline):
    def __call__(self, prompt=None, image=None, strength: float = 0.3,
                 num_inference_steps: int = 50, guidance_scale: float = 5.0,
                 negative_prompt=None, seed: int = 0, output_type: str = "pil",
                 original_size: Optional[Tuple[int, int]] = None,
                 crops_coords_top_left: Tuple[int, int] = (0, 0),
                 return_dict: bool = False):
        do_cfg = guidance_scale > 1.0
        cond, uncond, pooled, neg_pooled = self.encode_prompt(prompt,
                                                              negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        init = jnp.asarray(self.image_processor.preprocess(image))
        if init.shape[0] != batch:
            init = jnp.broadcast_to(init, (batch, *init.shape[1:]))
        height = init.shape[1]
        width = init.shape[2]
        latents0 = self.vae.encode(init.astype(self.vae.dtype)).sample(
            jax.random.PRNGKey(seed + 1)).astype(jnp.float32)
        latents0 = latents0 * self.vae.config.scaling_factor

        original_size = original_size or (height, width)
        add_time_ids = jnp.asarray(
            [list(original_size) + list(crops_coords_top_left)
             + [height, width]], jnp.float32)
        add_time_ids = jnp.broadcast_to(add_time_ids, (batch, 6))
        if do_cfg:
            add_text_embeds = jnp.concatenate([neg_pooled, pooled])
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids])
        else:
            add_text_embeds = pooled

        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=latents0.shape)
        t_start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        noise = jax.random.normal(jax.random.PRNGKey(seed), latents0.shape,
                                  jnp.float32)
        if hasattr(state, "sigmas"):
            latents = latents0 + state.sigmas[t_start] * noise
        else:
            t0 = state.timesteps[t_start].astype(jnp.int32)
            latents = self.scheduler.add_noise(latents0, noise, t0[None])

        unet, scheduler = self.unet, self.scheduler
        shape = latents.shape

        def build():
            def denoise(params, latents, context, text_embeds, time_ids, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        added_cond_kwargs={
                            "text_embeds": text_embeds.astype(unet.dtype),
                            "time_ids": time_ids.astype(unet.dtype),
                        }).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(t_start, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("sdxl_i2i", shape, num_inference_steps,
                                 t_start, do_cfg), build)(
            self.unet.params, latents, context, add_text_embeds, add_time_ids,
            state, jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)


@register_pipeline
class StableDiffusionXLInpaintPipeline(StableDiffusionXLPipeline):
    """4-channel-UNet inpainting: the known region is re-noised to each step's
    level and blended by the mask (the reference's legacy-style loop, which
    also backs its 9-channel variant's fallback)."""

    def __call__(self, prompt=None, image=None, mask_image=None,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0, output_type: str = "pil",
                 return_dict: bool = False):
        do_cfg = guidance_scale > 1.0
        cond, uncond, pooled, neg_pooled = self.encode_prompt(prompt,
                                                              negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        init = jnp.asarray(self.image_processor.preprocess(image))
        if init.shape[0] != batch:
            init = jnp.broadcast_to(init, (batch, *init.shape[1:]))
        height, width = init.shape[1:3]
        lat0 = self.vae.encode(init.astype(self.vae.dtype)).mode()
        lat0 = lat0.astype(jnp.float32) * self.vae.config.scaling_factor

        mask = jnp.asarray(np.asarray(mask_image, np.float32))
        if mask.ndim == 2:
            mask = mask[None, :, :, None]
        elif mask.ndim == 3:
            mask = mask[None] if mask.shape[-1] in (1, 3) else mask[..., None]
        mask = (mask[..., :1] > 0.5).astype(jnp.float32)
        mask_lat = jax.image.resize(mask, (batch, *lat0.shape[1:3], 1),
                                    "nearest")  # 1 = paint here

        add_time_ids = jnp.asarray([[height, width, 0, 0, height, width]],
                                   jnp.float32)
        add_time_ids = jnp.broadcast_to(add_time_ids, (batch, 6))
        if do_cfg:
            add_text_embeds = jnp.concatenate([neg_pooled, pooled])
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids])
        else:
            add_text_embeds = pooled

        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=lat0.shape)
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(key, lat0.shape, jnp.float32) * \
            self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        shape = lat0.shape

        def build():
            def denoise(params, latents, lat0, mask_lat, context, text_embeds,
                        time_ids, state, gs, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        added_cond_kwargs={
                            "text_embeds": text_embeds.astype(unet.dtype),
                            "time_ids": time_ids.astype(unet.dtype),
                        }).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    # pin the known region at the NEXT step's noise level
                    noise = jax.random.normal(sub, lat0.shape, jnp.float32)
                    t_next = state.timesteps[jnp.minimum(i + 1,
                                                         num_inference_steps - 1)]
                    known = scheduler.add_noise(
                        lat0, noise, jnp.broadcast_to(t_next, (batch,)))
                    known = jnp.where(i == num_inference_steps - 1, lat0, known)
                    latents = mask_lat * latents + (1 - mask_lat) * known
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, key))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("sdxl_inp", shape, num_inference_steps,
                                 do_cfg), build)(
            self.unet.params, latents, lat0, mask_lat, context,
            add_text_embeds, add_time_ids, state,
            jnp.asarray(guidance_scale, jnp.float32), key)
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
