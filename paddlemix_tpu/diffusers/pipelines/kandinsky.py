"""Kandinsky 2.2 pipelines (reference ppdiffusers/pipelines/kandinsky2_2):
prior (text -> CLIP image embedding via embed-space diffusion) and decoder
(image-embed-conditioned UNet -> MoVQ decode)."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class KandinskyV22PriorPipeline(DiffusionPipeline):
    def __init__(self, prior, image_encoder, text_encoder, tokenizer, scheduler,
                 image_processor=None):
        self.register_modules(prior=prior, image_encoder=image_encoder,
                              text_encoder=text_encoder, tokenizer=tokenizer,
                              scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, prompt, negative_prompt=None, num_inference_steps: int = 25,
                 guidance_scale: float = 4.0, seed: int = 0):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        do_cfg = guidance_scale > 1.0

        enc = self.tokenizer(prompt)
        seq, pooled = self.text_encoder(jnp.asarray(enc["input_ids"]))[:2]
        neg = self.tokenizer(negative_prompt)
        nseq, npooled = self.text_encoder(jnp.asarray(neg["input_ids"]))[:2]
        seq_all = jnp.concatenate([nseq, seq]) if do_cfg else seq
        pooled_all = jnp.concatenate([npooled, pooled]) if do_cfg else pooled

        d = self.prior.config.embedding_dim
        b = seq.shape[0]
        latents = jax.random.normal(jax.random.PRNGKey(seed), (b, d), jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        prior, scheduler = self.prior, self.scheduler

        def build():
            def denoise(params, latents, seq_all, pooled_all, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = prior.module.apply({"params": params},
                                              lat_in.astype(prior.dtype), t_in,
                                              pooled_all.astype(prior.dtype),
                                              seq_all.astype(prior.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return out

            return jax.jit(denoise)

        key = ("prior", latents.shape, num_inference_steps, do_cfg)
        image_embeds = self._jit.get(key, build)(
            self.prior.params, latents, seq_all, pooled_all, state,
            jnp.asarray(guidance_scale, jnp.float32))
        zero_embeds = jnp.zeros_like(image_embeds)
        return image_embeds, zero_embeds


@register_pipeline
class KandinskyV22Pipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler, movq):
        self.register_modules(unet=unet, scheduler=scheduler, movq=movq)
        self.movq_scale_factor = 2 ** (len(movq.config.block_out_channels) - 1) if movq else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.movq_scale_factor)
        self._jit = _JitCache()

    def __call__(self, image_embeds, negative_image_embeds=None, height: int = 512,
                 width: int = 512, num_inference_steps: int = 25,
                 guidance_scale: float = 4.0, seed: int = 0, output_type: str = "pil"):
        do_cfg = guidance_scale > 1.0
        if negative_image_embeds is None:
            negative_image_embeds = jnp.zeros_like(image_embeds)
        embeds = (jnp.concatenate([negative_image_embeds, image_embeds])
                  if do_cfg else image_embeds)
        batch = image_embeds.shape[0]
        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.movq_scale_factor,
                 width // self.movq_scale_factor, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        dummy_ctx = jnp.zeros((embeds.shape[0], 1,
                               unet.config.cross_attention_dim
                               if isinstance(unet.config.cross_attention_dim, int)
                               else unet.config.cross_attention_dim[0]), jnp.float32)

        def build():
            def denoise(params, latents, embeds, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        dummy_ctx.astype(unet.dtype),
                        added_cond_kwargs={"image_embeds": embeds.astype(unet.dtype)},
                    ).astype(jnp.float32)
                    pred = pred[..., :lat_ch]
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return out

            return jax.jit(denoise)

        key = ("decoder", shape, num_inference_steps, do_cfg)
        latents = self._jit.get(key, build)(
            self.unet.params, latents, embeds, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self.movq.decode(latents.astype(self.movq.dtype)).astype(jnp.float32)
        return (self.image_processor.postprocess(np.asarray(image), output_type),)


@register_pipeline
class KandinskyPipeline(DiffusionPipeline):
    """Kandinsky 2.1 text-to-image (reference pipelines/kandinsky): unlike
    2.2's pure image-embed conditioning, the 2.1 UNet cross-attends a HYBRID
    context — the multilingual (M-CLIP/XLM-R-style) text hidden states with
    the prior's image embedding projected in — and decodes through MoVQ."""

    def __init__(self, text_encoder, tokenizer, unet, scheduler, movq):
        self.register_modules(text_encoder=text_encoder, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler, movq=movq)
        self.movq_scale_factor = 2 ** (len(movq.config.block_out_channels) - 1) if movq else 8
        self._jit = _JitCache()

    def __call__(self, prompt, image_embeds, negative_image_embeds=None,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 4.0,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        do_cfg = guidance_scale > 1.0
        cond = self.text_encoder(jnp.asarray(
            self.tokenizer(prompt)["input_ids"]))[0]
        uncond = self.text_encoder(jnp.asarray(
            self.tokenizer([""] * len(prompt))["input_ids"]))[0]
        if negative_image_embeds is None:
            negative_image_embeds = jnp.zeros_like(image_embeds)
        # hybrid context: image embedding projected to a token prepended to
        # the text hidden states (2.1 text_proj behaviour, compact form)
        d = cond.shape[-1]

        def hybrid(text, img):
            img_tok = img[:, : d] if img.shape[-1] >= d else jnp.pad(
                img, ((0, 0), (0, d - img.shape[-1])))
            return jnp.concatenate([img_tok[:, None, :], text], axis=1)

        context = hybrid(cond, image_embeds)
        if do_cfg:
            context = jnp.concatenate(
                [hybrid(uncond, negative_image_embeds), context])

        batch = cond.shape[0]
        shape = (batch, height // self.movq_scale_factor,
                 width // self.movq_scale_factor, self.unet.config.in_channels)
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
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    pred = pred[..., : latents.shape[-1]]  # learned variance
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("k21", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        img = self.movq.decode(latents.astype(self.movq.dtype),
                               force_quantize=False).astype(jnp.float32)
        return (np.asarray(jnp.clip(img / 2 + 0.5, 0, 1)),)
