"""Text-to-video pipeline (reference ppdiffusers/pipelines/
text_to_video_synthesis + animatediff): motion UNet denoise loop over
(B, T, h, w, 4) latents, frames decoded by the image VAE."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class TextToVideoPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler):
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        from ..image_processor import VaeImageProcessor

        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        cond = self.text_encoder(jnp.asarray(self.tokenizer(prompt)["input_ids"]))[0]
        uncond = self.text_encoder(jnp.asarray(self.tokenizer(negative_prompt)["input_ids"]))[0]
        return cond, uncond

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        num_frames: int = 16,
        height: int = 256,
        width: int = 256,
        num_inference_steps: int = 25,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        output_type: str = "np",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        shape = (batch, num_frames, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma

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

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return out

            return jax.jit(denoise)

        denoise = self._jit.get(("denoise", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        b, t = latents.shape[:2]
        flat = latents.reshape(b * t, *latents.shape[2:]) / self.vae.config.scaling_factor
        frames = self.vae.decode(flat.astype(self.vae.dtype)).astype(jnp.float32)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(b, t, *frames.shape[1:]),)
