"""LVDM pipelines (reference ppdiffusers/pipelines/lvdm): short-video
generation over the TRUE 3-D latent stack — the LVDM VAE compresses time as
well as space; the 3-D UNet denoises (B, T', h, w, 4) latents in one jitted
fori_loop."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache


class _LVDMBase(DiffusionPipeline):
    def _denoise(self, latents, context, steps, guidance_scale, key, tag):
        do_cfg = context is not None and guidance_scale > 1.0
        state = make_scheduler_state(self.scheduler, steps,
                                     sample_shape=latents.shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def run(params, latents, context, state, gs, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    if do_cfg:
                        lat_in = jnp.concatenate([latents, latents])
                    else:
                        lat_in = latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t,
                        None if context is None else
                        context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents,
                                                    key=sub)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, steps, body,
                                              (latents, state, key))
                return out

            return jax.jit(run)

        return self._jit.get((tag, latents.shape, steps, do_cfg), build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32), key)

    def _decode(self, latents):
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        return np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1))


@register_pipeline
class LVDMUncondPipeline(_LVDMBase):
    """Unconditional short video (reference
    pipeline_latent_video_diffusion_model_uncond.py)."""

    def __init__(self, vae, unet, scheduler):
        self.register_modules(vae=vae, unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_frames: int = 4,
                 height: int = 64, width: int = 64,
                 num_inference_steps: int = 50, seed: int = 0,
                 output_type: str = "np"):
        f_s = 2 ** (len(self.vae.config.block_out_channels) - 1)
        f_t = int(np.prod(self.vae.config.temporal_down))
        shape = (batch_size, max(num_frames // f_t, 1), height // f_s,
                 width // f_s, self.unet.config.in_channels)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        latents = jax.random.normal(sub, shape, jnp.float32)
        latents = self._denoise(latents, None, num_inference_steps, 1.0, key,
                                "lvdm_uncond")
        return (self._decode(latents),)


@register_pipeline
class LVDMTextToVideoPipeline(_LVDMBase):
    """Text-to-video (reference
    pipeline_latent_video_diffusion_model_text2video.py)."""

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler):
        self.register_modules(vae=vae, text_encoder=text_encoder,
                              tokenizer=tokenizer, unet=unet,
                              scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, prompt, num_frames: int = 4, height: int = 64,
                 width: int = 64, num_inference_steps: int = 50,
                 guidance_scale: float = 9.0, seed: int = 0,
                 output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        cond = self.text_encoder(jnp.asarray(
            self.tokenizer(prompt)["input_ids"]))[0]
        uncond = self.text_encoder(jnp.asarray(
            self.tokenizer([""] * len(prompt))["input_ids"]))[0]
        context = jnp.concatenate([uncond, cond]) \
            if guidance_scale > 1.0 else cond
        f_s = 2 ** (len(self.vae.config.block_out_channels) - 1)
        f_t = int(np.prod(self.vae.config.temporal_down))
        shape = (cond.shape[0], max(num_frames // f_t, 1), height // f_s,
                 width // f_s, self.unet.config.in_channels)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        latents = jax.random.normal(sub, shape, jnp.float32)
        latents = self._denoise(latents, context, num_inference_steps,
                                guidance_scale, key, "lvdm_t2v")
        return (self._decode(latents),)
