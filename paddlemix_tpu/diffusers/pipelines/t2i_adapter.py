"""T2I-Adapter text-to-image (reference
ppdiffusers/pipelines/t2i_adapter/pipeline_stable_diffusion_adapter.py +
pipeline_stable_diffusion_xl_adapter.py): the adapter trunk runs ONCE on the
condition image; its per-resolution features enter the UNet as intrablock
residuals every denoise step (inside the jitted fori_loop as loop constants)."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import StableDiffusionPipeline, _JitCache


@register_pipeline
class StableDiffusionAdapterPipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, adapter, scheduler,
                 safety_checker=None, feature_extractor=None):
        super().__init__(vae, text_encoder, tokenizer, unet, scheduler,
                         safety_checker=safety_checker,
                         feature_extractor=feature_extractor)
        self.register_modules(adapter=adapter)

    def _build_adapter_denoise(self, num_steps: int, do_cfg: bool):
        unet, scheduler = self.unet, self.scheduler

        def denoise(params, latents, context, state, guidance_scale, feats):
            def body(i, carry):
                latents, state = carry
                t = state.timesteps[i]
                lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                lat_in = scheduler.scale_model_input(state, lat_in, i)
                t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                fs = [jnp.concatenate([f, f]) if do_cfg else f for f in feats]
                pred = unet.module.apply(
                    {"params": params}, lat_in.astype(unet.dtype), t_in,
                    context.astype(unet.dtype),
                    down_intrablock_additional_residuals=fs).astype(jnp.float32)
                if do_cfg:
                    un, co = jnp.split(pred, 2)
                    pred = un + guidance_scale * (co - un)
                latents, state = scheduler.step(state, pred, i, latents)
                return latents, state

            latents_out, _ = jax.lax.fori_loop(0, num_steps, body, (latents, state))
            return latents_out

        return jax.jit(denoise)

    def __call__(self, prompt=None, image=None, height: int = 512,
                 width: int = 512, num_inference_steps: int = 50,
                 guidance_scale: float = 7.5, adapter_conditioning_scale: float = 1.0,
                 negative_prompt=None, seed: int = 0, output_type: str = "np",
                 latents: Optional[jnp.ndarray] = None):
        from .pipeline_utils import make_scheduler_state

        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        img = jnp.asarray(np.asarray(image, np.float32))
        if img.ndim == 3:
            img = img[None]
        if img.max() > 1.5:
            img = img / 255.0
        feats = self.adapter(img)
        feats = [f.astype(jnp.float32) * adapter_conditioning_scale for f in feats]

        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        denoise = self._jit.get(
            ("adapter", shape, num_inference_steps, do_cfg),
            lambda: self._build_adapter_denoise(num_inference_steps, do_cfg))
        latents = denoise(self.unet.params, latents, context, state,
                          jnp.asarray(guidance_scale, jnp.float32), feats)
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
