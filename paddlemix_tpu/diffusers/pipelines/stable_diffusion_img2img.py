"""SD image-to-image + inpainting pipelines (reference
ppdiffusers/pipelines/stable_diffusion/pipeline_stable_diffusion_img2img.py,
pipeline_stable_diffusion_inpaint.py — benched in deploy/README.md:36-49).
Same jitted fori_loop core as text2img; the loop starts at a strength-derived
step offset."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import StableDiffusionPipeline, _JitCache


@register_pipeline
class StableDiffusionImg2ImgPipeline(StableDiffusionPipeline):
    def __call__(  # type: ignore[override]
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        batch = cond.shape[0]

        init = jnp.asarray(self.image_processor.preprocess(image))
        if init.shape[0] != batch:
            init = jnp.broadcast_to(init, (batch, *init.shape[1:]))
        posterior = self.vae.encode(init.astype(self.vae.dtype))
        latents0 = posterior.sample(jax.random.PRNGKey(seed + 1)).astype(jnp.float32)
        latents0 = latents0 * self.vae.config.scaling_factor

        state = self.scheduler.set_timesteps(num_inference_steps)
        t_start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        noise = jax.random.normal(jax.random.PRNGKey(seed), latents0.shape, jnp.float32)
        t0 = state.timesteps[t_start].astype(jnp.int32)
        if hasattr(state, "sigmas"):  # euler-family: x = x0 + sigma*noise
            latents = latents0 + state.sigmas[t_start] * noise
        else:
            latents = self.scheduler.add_noise(latents0, noise, t0[None])

        shape = latents.shape
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply({"params": params}, lat_in.astype(unet.dtype),
                                             t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                latents, _ = jax.lax.fori_loop(t_start, num_inference_steps, body,
                                               (latents, state))
                return latents

            return jax.jit(denoise)

        denoise = self._jit.get(("i2i", shape, num_inference_steps, t_start, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)


@register_pipeline
class StableDiffusionInpaintPipeline(StableDiffusionPipeline):
    """Legacy (4-channel) inpainting: keep unmasked region from the original
    latents at every step."""

    def __call__(  # type: ignore[override]
        self,
        prompt=None,
        image=None,
        mask_image=None,
        strength: float = 1.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        batch = cond.shape[0]

        init = jnp.asarray(self.image_processor.preprocess(image))
        if init.shape[0] != batch:
            init = jnp.broadcast_to(init, (batch, *init.shape[1:]))
        posterior = self.vae.encode(init.astype(self.vae.dtype))
        init_latents = posterior.mode().astype(jnp.float32) * self.vae.config.scaling_factor

        # mask: 1 = repaint, 0 = keep; downsample to latent res
        mask = np.asarray(mask_image, np.float32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = (mask > 127.5).astype(np.float32) if mask.max() > 1.5 else (mask > 0.5).astype(np.float32)
        lh, lw = init_latents.shape[1:3]
        mask_lat = jax.image.resize(jnp.asarray(mask)[None, :, :, None],
                                    (1, lh, lw, 1), "nearest")
        mask_lat = jnp.broadcast_to(mask_lat, init_latents.shape[:3] + (1,))

        state = self.scheduler.set_timesteps(num_inference_steps)
        noise = jax.random.normal(jax.random.PRNGKey(seed), init_latents.shape, jnp.float32)
        latents = noise * self.scheduler.init_noise_sigma

        unet, scheduler = self.unet, self.scheduler
        shape = latents.shape

        def build():
            def denoise(params, latents, init_latents, mask_lat, context, state, gs, noise):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply({"params": params}, lat_in.astype(unet.dtype),
                                             t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    # splice the known region back, renoised to the next level
                    nxt = jnp.minimum(i + 1, num_inference_steps - 1)
                    if hasattr(state, "sigmas"):
                        known = init_latents + state.sigmas[nxt] * noise
                    else:
                        t_next = state.timesteps[nxt].astype(jnp.int32)
                        known = scheduler.add_noise(init_latents, noise, t_next[None])
                    latents = jnp.where(mask_lat > 0.5, latents, known)
                    return latents, state

                latents, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                # final: exact known region
                return jnp.where(mask_lat > 0.5, latents, init_latents)

            return jax.jit(denoise)

        denoise = self._jit.get(("inpaint", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, init_latents, mask_lat, context,
                          state, jnp.asarray(guidance_scale, jnp.float32), noise)
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
