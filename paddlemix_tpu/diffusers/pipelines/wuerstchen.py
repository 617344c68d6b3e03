"""Wuerstchen pipelines (reference ppdiffusers/pipelines/wuerstchen/
pipeline_wuerstchen_prior.py, pipeline_wuerstchen.py,
pipeline_wuerstchen_combined.py): stage C diffuses a 16-channel EfficientNet
latent from text, stage B expands it x10.67 into Paella VQ space, the VQGAN
decodes x4 to pixels. Both denoise loops run as single jitted fori_loops with
per-step RNG folded from one seed."""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache

# reference pipeline_wuerstchen_prior.py:33
DEFAULT_STAGE_C_TIMESTEPS = (list(np.linspace(1.0, 2 / 3, 20))
                             + list(np.linspace(2 / 3, 0.0, 11))[1:])


def _ancestral_denoise(model_apply, scheduler, latents, state, guidance_scale,
                       do_cfg, seed, num_steps):
    """Shared fori_loop driver: model_apply(lat_in, t_in) -> prediction."""

    def body(i, carry):
        latents, state = carry
        t = state.timesteps[i]
        lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
        t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
        pred = model_apply(lat_in, t_in)
        if do_cfg:
            un, co = jnp.split(pred, 2)
            pred = un + guidance_scale * (co - un)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        latents, state = scheduler.step(state, pred, i, latents, key=key)
        return latents, state

    out, _ = jax.lax.fori_loop(0, num_steps, body, (latents, state))
    return out


@register_pipeline
class WuerstchenPriorPipeline(DiffusionPipeline):
    """Stage C: text -> EfficientNet-space latents (B, h/42.67, w/42.67, 16)."""

    def __init__(self, prior, text_encoder, tokenizer, scheduler,
                 latent_mean: float = 42.0, latent_std: float = 1.0,
                 resolution_multiple: float = 42.67):
        self.register_modules(prior=prior, text_encoder=text_encoder,
                              tokenizer=tokenizer, scheduler=scheduler)
        self.latent_mean = latent_mean
        self.latent_std = latent_std
        self.resolution_multiple = resolution_multiple
        self._jit = _JitCache()

    def _encode(self, prompts):
        enc = self.tokenizer(prompts)
        return self.text_encoder(jnp.asarray(enc["input_ids"]))[0]

    def __call__(self, prompt: Union[str, List[str]], negative_prompt=None,
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 60, timesteps=None,
                 guidance_scale: float = 8.0, seed: int = 0,
                 output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        do_cfg = guidance_scale > 1.0

        ctx = self._encode(prompt)
        if do_cfg:
            ctx = jnp.concatenate([self._encode(negative_prompt), ctx])

        b = len(prompt)
        lh = math.ceil(height / self.resolution_multiple)
        lw = math.ceil(width / self.resolution_multiple)
        shape = (b, lh, lw, self.prior.config.c_in)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps, timesteps=timesteps)
        num_steps = int(state.num_inference_steps)
        prior, scheduler = self.prior, self.scheduler

        def build():
            def denoise(params, latents, ctx, state, gs):
                def apply(lat_in, t_in):
                    return prior.module.apply(
                        {"params": params}, lat_in.astype(prior.dtype), t_in,
                        ctx.astype(prior.dtype)).astype(jnp.float32)
                return _ancestral_denoise(apply, scheduler, latents, state, gs,
                                          do_cfg, seed, num_steps)

            return jax.jit(denoise)

        key = ("wprior", shape, num_steps, do_cfg, seed)
        latents = self._jit.get(key, build)(
            self.prior.params, latents, ctx, state,
            jnp.asarray(guidance_scale, jnp.float32))
        # reference pipeline_wuerstchen_prior.py:498 denormalization
        return (latents * self.latent_mean - self.latent_std,)


@register_pipeline
class WuerstchenDecoderPipeline(DiffusionPipeline):
    """Stage B + VQGAN: image_embeddings (+ text) -> pixels."""

    def __init__(self, decoder, text_encoder, tokenizer, vqgan, scheduler,
                 latent_dim_scale: float = 10.67):
        self.register_modules(decoder=decoder, text_encoder=text_encoder,
                              tokenizer=tokenizer, vqgan=vqgan, scheduler=scheduler)
        self.latent_dim_scale = latent_dim_scale
        self.image_processor = VaeImageProcessor(vae_scale_factor=4)
        self._jit = _JitCache()

    def _encode(self, prompts):
        enc = self.tokenizer(prompts)
        return self.text_encoder(jnp.asarray(enc["input_ids"]))[0]

    def __call__(self, image_embeddings, prompt: Union[str, List[str]] = "",
                 negative_prompt=None, num_inference_steps: int = 12,
                 timesteps=None, guidance_scale: float = 0.0, seed: int = 0,
                 output_type: str = "np"):
        if image_embeddings.ndim == 3:
            image_embeddings = image_embeddings[None]
        b = image_embeddings.shape[0]
        if isinstance(prompt, str):
            prompt = [prompt] * b
        do_cfg = guidance_scale > 1.0

        ctx = self._encode(prompt)
        effnet = jnp.asarray(image_embeddings, jnp.float32)
        if do_cfg:
            negative_prompt = negative_prompt or [""] * b
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * b
            ctx = jnp.concatenate([self._encode(negative_prompt), ctx])
            effnet = jnp.concatenate([jnp.zeros_like(effnet), effnet])

        lh = int(image_embeddings.shape[1] * self.latent_dim_scale)
        lw = int(image_embeddings.shape[2] * self.latent_dim_scale)
        shape = (b, lh, lw, self.decoder.config.c_in)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps, timesteps=timesteps)
        num_steps = int(state.num_inference_steps)
        decoder, scheduler = self.decoder, self.scheduler

        def build():
            def denoise(params, latents, effnet, ctx, state, gs):
                def apply(lat_in, t_in):
                    return decoder.module.apply(
                        {"params": params}, lat_in.astype(decoder.dtype), t_in,
                        effnet.astype(decoder.dtype),
                        ctx.astype(decoder.dtype)).astype(jnp.float32)
                return _ancestral_denoise(apply, scheduler, latents, state, gs,
                                          do_cfg, seed, num_steps)

            return jax.jit(denoise)

        key = ("wdec", shape, num_steps, do_cfg, seed)
        latents = self._jit.get(key, build)(
            self.decoder.params, latents, effnet, ctx, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        scale = self.vqgan.config.scale_factor
        image = self.vqgan.decode((latents * scale).astype(self.vqgan.dtype))
        image = np.asarray(jnp.clip(image.astype(jnp.float32), 0, 1))
        if output_type == "np":
            return (image,)
        return (self.image_processor.postprocess(image * 2 - 1, output_type),)


@register_pipeline
class WuerstchenCombinedPipeline(DiffusionPipeline):
    """text -> image chaining prior and decoder (pipeline_wuerstchen_combined.py)."""

    def __init__(self, tokenizer, text_encoder, decoder, scheduler, vqgan,
                 prior_tokenizer=None, prior_text_encoder=None, prior_prior=None,
                 prior_scheduler=None):
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              decoder=decoder, scheduler=scheduler, vqgan=vqgan)
        self.prior_pipe = WuerstchenPriorPipeline(
            prior=prior_prior, text_encoder=prior_text_encoder or text_encoder,
            tokenizer=prior_tokenizer or tokenizer,
            scheduler=prior_scheduler or scheduler)
        self.decoder_pipe = WuerstchenDecoderPipeline(
            decoder=decoder, text_encoder=text_encoder, tokenizer=tokenizer,
            vqgan=vqgan, scheduler=scheduler)

    def __call__(self, prompt, negative_prompt=None, height: int = 1024,
                 width: int = 1024, prior_num_inference_steps: int = 60,
                 prior_guidance_scale: float = 4.0, num_inference_steps: int = 12,
                 guidance_scale: float = 0.0, seed: int = 0,
                 output_type: str = "np"):
        embeddings = self.prior_pipe(
            prompt, negative_prompt=negative_prompt, height=height, width=width,
            num_inference_steps=prior_num_inference_steps,
            timesteps=DEFAULT_STAGE_C_TIMESTEPS
            if prior_num_inference_steps == 60 else None,
            guidance_scale=prior_guidance_scale, seed=seed)[0]
        return self.decoder_pipe(
            embeddings, prompt=prompt, negative_prompt=negative_prompt,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed, output_type=output_type)
