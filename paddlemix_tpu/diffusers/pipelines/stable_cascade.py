"""Stable Cascade pipelines: stage-C prior (text+optional image embed ->
EfficientNet latents), stage-B decoder (+ stage-A Paella VQGAN decode).

The reference ships Stable Cascade as example training code over the
models/stable_cascade modules with a GDF sampler
(examples/stable_cascade/ldm/model_c.py); generation here follows the same
cosine-ratio schedule via DDPMWuerstchenScheduler, jitted as one fori_loop."""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache
from .wuerstchen import _ancestral_denoise


@register_pipeline
class StableCascadePriorPipeline(DiffusionPipeline):
    def __init__(self, prior, text_encoder, tokenizer, scheduler,
                 image_encoder=None, resolution_multiple: float = 42.67):
        self.register_modules(prior=prior, text_encoder=text_encoder,
                              tokenizer=tokenizer, scheduler=scheduler,
                              image_encoder=image_encoder)
        self.resolution_multiple = resolution_multiple
        self._jit = _JitCache()

    def _encode(self, prompts):
        enc = self.tokenizer(prompts)
        out = self.text_encoder(jnp.asarray(enc["input_ids"]))
        seq, pooled = out[0], out[1]
        return seq, pooled

    def __call__(self, prompt: Union[str, List[str]], negative_prompt=None,
                 images=None, height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 20, guidance_scale: float = 4.0,
                 seed: int = 0):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        do_cfg = guidance_scale > 1.0
        b = len(prompt)

        seq, pooled = self._encode(prompt)
        if self.image_encoder is not None and images is not None:
            img_embed = self.image_encoder.encode_image(jnp.asarray(images))[:, None, :]
        else:
            img_embed = jnp.zeros((b, 1, self.prior.config.c_clip_img))
        if do_cfg:
            nseq, npooled = self._encode(negative_prompt)
            seq = jnp.concatenate([nseq, seq])
            pooled = jnp.concatenate([npooled, pooled])
            img_embed = jnp.concatenate([jnp.zeros_like(img_embed), img_embed])

        lh = math.ceil(height / self.resolution_multiple)
        lw = math.ceil(width / self.resolution_multiple)
        shape = (b, lh, lw, self.prior.config.c_in)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        prior, scheduler = self.prior, self.scheduler

        def build():
            def denoise(params, latents, seq, pooled, img_embed, state, gs):
                def apply(lat_in, t_in):
                    return prior.module.apply(
                        {"params": params}, lat_in.astype(prior.dtype), t_in,
                        clip_text=seq.astype(prior.dtype),
                        clip_text_pooled=pooled.astype(prior.dtype),
                        clip_img=img_embed.astype(prior.dtype)).astype(jnp.float32)
                return _ancestral_denoise(apply, scheduler, latents, state, gs,
                                          do_cfg, seed, num_inference_steps)

            return jax.jit(denoise)

        key = ("scprior", shape, num_inference_steps, do_cfg, seed)
        latents = self._jit.get(key, build)(
            self.prior.params, latents, seq, pooled, img_embed, state,
            jnp.asarray(guidance_scale, jnp.float32))
        return (latents,)


@register_pipeline
class StableCascadeDecoderPipeline(DiffusionPipeline):
    def __init__(self, decoder, text_encoder, tokenizer, vqgan, scheduler,
                 latent_dim_scale: float = 10.67):
        self.register_modules(decoder=decoder, text_encoder=text_encoder,
                              tokenizer=tokenizer, vqgan=vqgan, scheduler=scheduler)
        self.latent_dim_scale = latent_dim_scale
        self.image_processor = VaeImageProcessor(vae_scale_factor=4)
        self._jit = _JitCache()

    def _encode(self, prompts):
        enc = self.tokenizer(prompts)
        return self.text_encoder(jnp.asarray(enc["input_ids"]))[1]  # pooled

    def __call__(self, image_embeddings, prompt: Union[str, List[str]] = "",
                 negative_prompt=None, num_inference_steps: int = 10,
                 guidance_scale: float = 0.0, seed: int = 0,
                 output_type: str = "np"):
        if image_embeddings.ndim == 3:
            image_embeddings = image_embeddings[None]
        b = image_embeddings.shape[0]
        if isinstance(prompt, str):
            prompt = [prompt] * b
        do_cfg = guidance_scale > 1.0

        clip = self._encode(prompt)[:, None, :]
        effnet = jnp.asarray(image_embeddings, jnp.float32)
        if do_cfg:
            negative_prompt = negative_prompt or [""] * b
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * b
            clip = jnp.concatenate([self._encode(negative_prompt)[:, None, :], clip])
            effnet = jnp.concatenate([jnp.zeros_like(effnet), effnet])

        lh = int(image_embeddings.shape[1] * self.latent_dim_scale)
        lw = int(image_embeddings.shape[2] * self.latent_dim_scale)
        shape = (b, lh, lw, self.decoder.config.c_in)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        decoder, scheduler = self.decoder, self.scheduler

        def build():
            def denoise(params, latents, effnet, clip, state, gs):
                def apply(lat_in, t_in):
                    return decoder.module.apply(
                        {"params": params}, lat_in.astype(decoder.dtype), t_in,
                        effnet=effnet.astype(decoder.dtype),
                        clip=clip.astype(decoder.dtype)).astype(jnp.float32)
                return _ancestral_denoise(apply, scheduler, latents, state, gs,
                                          do_cfg, seed, num_inference_steps)

            return jax.jit(denoise)

        key = ("scdec", shape, num_inference_steps, do_cfg, seed)
        latents = self._jit.get(key, build)(
            self.decoder.params, latents, effnet, clip, state,
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
class StableCascadeCombinedPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, decoder, scheduler, vqgan,
                 prior_prior=None, prior_text_encoder=None, prior_tokenizer=None,
                 prior_scheduler=None, image_encoder=None):
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              decoder=decoder, scheduler=scheduler, vqgan=vqgan)
        self.prior_pipe = StableCascadePriorPipeline(
            prior=prior_prior, text_encoder=prior_text_encoder or text_encoder,
            tokenizer=prior_tokenizer or tokenizer,
            scheduler=prior_scheduler or scheduler, image_encoder=image_encoder)
        self.decoder_pipe = StableCascadeDecoderPipeline(
            decoder=decoder, text_encoder=text_encoder, tokenizer=tokenizer,
            vqgan=vqgan, scheduler=scheduler)

    def __call__(self, prompt, negative_prompt=None, height: int = 1024,
                 width: int = 1024, prior_num_inference_steps: int = 20,
                 prior_guidance_scale: float = 4.0, num_inference_steps: int = 10,
                 guidance_scale: float = 0.0, seed: int = 0,
                 output_type: str = "np"):
        embeddings = self.prior_pipe(
            prompt, negative_prompt=negative_prompt, height=height, width=width,
            num_inference_steps=prior_num_inference_steps,
            guidance_scale=prior_guidance_scale, seed=seed)[0]
        return self.decoder_pipe(
            embeddings, prompt=prompt, negative_prompt=negative_prompt,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed, output_type=output_type)
