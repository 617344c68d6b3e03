"""Versatile Diffusion (reference ppdiffusers/pipelines/versatile_diffusion):
one shared image UNet serving text-to-image, image-variation and dual-guided
generation.

Compact TPU rebuild: the three task pipelines share the UNet + VAE; text
conditioning uses the CLIP text tower's projected+normalized embeddings and
image conditioning the CLIP vision token sequence (the reference's
ContextCLIP normalization quirks are documented on encode_*). The reference's
optional text-latent "flat" UNet (modeling_text_unet.py UNetFlatConditionModel
:314, used to also DIFFUSE text latents) is out of scope — generation toward
images covers the shipped task surface."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache


class _VDBase(DiffusionPipeline):
    def __init__(self, vae, unet, scheduler, tokenizer=None, text_encoder=None,
                 image_encoder=None, image_feature_extractor=None):
        self.register_modules(vae=vae, unet=unet, scheduler=scheduler,
                              tokenizer=tokenizer, text_encoder=text_encoder,
                              image_encoder=image_encoder)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def encode_text(self, texts):
        """VD quirk (reference _encode_text_prompt): final-layer hidden states
        are projected and l2-normalized before entering cross-attention."""
        ids = jnp.asarray(self.tokenizer(texts)["input_ids"])
        hidden = self.text_encoder(ids)[0]
        return hidden / jnp.linalg.norm(hidden, axis=-1, keepdims=True)

    def encode_image(self, image):
        px = jnp.asarray(np.asarray(image, np.float32))
        if px.ndim == 3:
            px = px[None]
        if px.max() > 1.5:
            px = px / 127.5 - 1.0
        emb = self.image_encoder.encode_image(px)
        if emb.ndim == 2:
            emb = emb[:, None, :]
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def _denoise(self, latents, context, num_inference_steps, guidance_scale,
                 tag):
        do_cfg = guidance_scale > 1.0
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=latents.shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def run(params, latents, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(run)

        return self._jit.get((tag, latents.shape, num_inference_steps, do_cfg),
                             build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))

    def _decode(self, latents):
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        return np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1))


@register_pipeline
class VersatileDiffusionTextToImagePipeline(_VDBase):
    def __call__(self, prompt, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        cond = self.encode_text(prompt)
        uncond = self.encode_text([""] * len(prompt))
        do_cfg = guidance_scale > 1.0
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        shape = (cond.shape[0], height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        latents = self._denoise(latents, context, num_inference_steps,
                                guidance_scale, "vd_t2i")
        return (self._decode(latents),)


@register_pipeline
class VersatileDiffusionImageVariationPipeline(_VDBase):
    def __call__(self, image, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 seed: int = 0, output_type: str = "np"):
        cond = self.encode_image(image)
        do_cfg = guidance_scale > 1.0
        context = jnp.concatenate([jnp.zeros_like(cond), cond]) if do_cfg else cond
        shape = (cond.shape[0], height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        latents = self._denoise(latents, context, num_inference_steps,
                                guidance_scale, "vd_var")
        return (self._decode(latents),)


@register_pipeline
class VersatileDiffusionDualGuidedPipeline(_VDBase):
    """Text + image guidance mixed by text_to_image_strength (reference
    pipeline_versatile_diffusion_dual_guided.py — there via dual attention
    streams; here the normalized context rows are concatenated and the two
    modality blocks scaled by the mixing ratio before cross-attention)."""

    def __call__(self, prompt, image, text_to_image_strength: float = 0.5,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        text_ctx = self.encode_text(prompt)
        img_ctx = self.encode_image(image)
        w = float(text_to_image_strength)
        cond = jnp.concatenate([text_ctx * w, img_ctx * (1.0 - w)], axis=1)
        uncond = jnp.concatenate([self.encode_text([""] * len(prompt)) * w,
                                  jnp.zeros_like(img_ctx)], axis=1)
        do_cfg = guidance_scale > 1.0
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        shape = (cond.shape[0], height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        latents = self._denoise(latents, context, num_inference_steps,
                                guidance_scale, "vd_dual")
        return (self._decode(latents),)
