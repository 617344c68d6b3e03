"""PixArt-α text-to-image (reference
ppdiffusers/pipelines/pixart_alpha/pipeline_pixart_alpha.py): T5 caption
encoding -> PixArt transformer denoise (learned-variance eps split like DiT)
-> VAE decode, one jitted fori_loop."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class PixArtAlphaPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              vae=vae, transformer=transformer, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def encode_prompt(self, prompt):
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        out = self.text_encoder(ids)
        return out[0] if isinstance(out, tuple) else out

    def __call__(self, prompt: Union[str, List[str]], negative_prompt=None,
                 height: Optional[int] = None, width: Optional[int] = None,
                 num_inference_steps: int = 20, guidance_scale: float = 4.5,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        do_cfg = guidance_scale > 1.0
        cond = self.encode_prompt(prompt)
        ctx = jnp.concatenate([self.encode_prompt(negative_prompt), cond]) \
            if do_cfg else cond

        tf = self.transformer
        size = tf.config.sample_size
        height = height or size * self.vae_scale_factor
        width = width or size * self.vae_scale_factor
        b = len(prompt)
        shape = (b, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, tf.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        from .pipeline_utils import make_scheduler_state
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        scheduler = self.scheduler
        lat_ch = tf.config.in_channels

        def build():
            def denoise(params, latents, ctx, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = tf.module.apply({"params": params},
                                           lat_in.astype(tf.dtype), t_in,
                                           ctx.astype(tf.dtype)).astype(jnp.float32)
                    pred = pred[..., :lat_ch]  # drop learned variance
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("pixart", shape, num_inference_steps, do_cfg),
                                build)(tf.params, latents, ctx, state,
                                       jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self.vae.decode((latents / self.vae.config.scaling_factor
                                 ).astype(self.vae.dtype)).astype(jnp.float32)
        return (self.image_processor.postprocess(np.asarray(image), output_type),)
