"""DeepFloyd-IF pipelines (reference ppdiffusers/pipelines/deepfloyd_if):
pixel-space cascade — stage I generates 64px images conditioned on T5
embeddings (UNet predicts epsilon + learned variance: 6 output channels),
stage II upscales with the low-res image concatenated to the latents."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


class _IFBase(DiffusionPipeline):
    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        enc = self.tokenizer(prompt)
        cond = self.text_encoder(jnp.asarray(enc["input_ids"]),
                                 jnp.asarray(enc["attention_mask"]))[0]
        neg = self.tokenizer(negative_prompt)
        uncond = self.text_encoder(jnp.asarray(neg["input_ids"]),
                                   jnp.asarray(neg["attention_mask"]))[0]
        return cond, uncond

    def _denoise(self, latents, context, state, num_inference_steps, do_cfg,
                 guidance_scale, extra_channels=None):
        unet, scheduler = self.unet, self.scheduler
        out_ch = latents.shape[-1]

        def build():
            def denoise(params, latents, context, state, gs, extra):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    if extra is not None:
                        ex_in = jnp.concatenate([extra, extra]) if do_cfg else extra
                        lat_in = jnp.concatenate([lat_in, ex_in], axis=-1)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply({"params": params}, lat_in.astype(unet.dtype),
                                             t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    pred = pred[..., :out_ch]  # drop learned-variance channels
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return out

            return jax.jit(denoise)

        key = ("denoise", latents.shape, num_inference_steps, do_cfg,
               None if extra_channels is None else extra_channels.shape)
        return self._jit.get(key, build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32), extra_channels)


@register_pipeline
class IFPipeline(_IFBase):
    def __init__(self, unet, scheduler, text_encoder, tokenizer,
                 safety_checker=None, feature_extractor=None, watermarker=None):
        self.register_modules(unet=unet, scheduler=scheduler,
                              text_encoder=text_encoder, tokenizer=tokenizer)
        self.image_processor = VaeImageProcessor(vae_scale_factor=1)
        self._jit = _JitCache()

    def __call__(self, prompt=None, num_inference_steps: int = 50,
                 guidance_scale: float = 7.0, negative_prompt=None, seed: int = 0,
                 height: Optional[int] = None, width: Optional[int] = None,
                 output_type: str = "pil", return_dict: bool = False):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        size = height or self.unet.config.sample_size
        ch = self.unet.config.in_channels
        latents = jax.random.normal(jax.random.PRNGKey(seed),
                                    (batch, size, width or size, ch), jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        image = self._denoise(latents, context, state, num_inference_steps, do_cfg,
                              guidance_scale)
        if output_type == "latent":
            return (image,)
        return (self.image_processor.postprocess(np.asarray(image), output_type),)


@register_pipeline
class IFSuperResolutionPipeline(_IFBase):
    def __init__(self, unet, scheduler, text_encoder, tokenizer,
                 image_noising_scheduler=None, safety_checker=None,
                 feature_extractor=None, watermarker=None):
        self.register_modules(unet=unet, scheduler=scheduler,
                              text_encoder=text_encoder, tokenizer=tokenizer)
        self.image_processor = VaeImageProcessor(vae_scale_factor=1)
        self._jit = _JitCache()

    def __call__(self, image=None, prompt=None, num_inference_steps: int = 50,
                 guidance_scale: float = 4.0, negative_prompt=None, seed: int = 0,
                 output_type: str = "pil", return_dict: bool = False):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        low = jnp.asarray(image, jnp.float32)
        if low.ndim == 3:
            low = low[None]
        size = self.unet.config.sample_size
        upscaled = jax.image.resize(low, (batch, size, size, low.shape[-1]), "bilinear")

        ch = self.unet.config.in_channels - upscaled.shape[-1]
        latents = jax.random.normal(jax.random.PRNGKey(seed),
                                    (batch, size, size, ch), jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        out = self._denoise(latents, context, state, num_inference_steps, do_cfg,
                            guidance_scale, extra_channels=upscaled)
        if output_type == "latent":
            return (out,)
        return (self.image_processor.postprocess(np.asarray(out), output_type),)
