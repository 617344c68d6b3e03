"""SD3 text-to-image pipeline (reference
ppdiffusers/pipelines/stable_diffusion_3/pipeline_stable_diffusion_3.py).

The reference's 2-GPU CFG batch-parallel trick (dist.scatter/all_gather at
:805-846) is subsumed here: CFG rides the batch axis inside ONE jitted
fori_loop, so sharding the batch over the mesh's data axis parallelizes
cond/uncond across chips with zero extra code. T5 (text_encoder_3) is
optional, as in the reference's drop_t5 deployment mode."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class StableDiffusion3Pipeline(DiffusionPipeline):
    def __init__(self, transformer, scheduler, vae, text_encoder, tokenizer,
                 text_encoder_2, tokenizer_2, text_encoder_3=None, tokenizer_3=None):
        self.register_modules(
            transformer=transformer, scheduler=scheduler, vae=vae,
            text_encoder=text_encoder, tokenizer=tokenizer,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2,
            text_encoder_3=text_encoder_3, tokenizer_3=tokenizer_3,
        )
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def encode_prompt(self, prompt, negative_prompt=None, t5_seq_len: int = 77):
        if isinstance(prompt, str):
            prompt = [prompt]
        batch = len(prompt)
        negative_prompt = negative_prompt or [""] * batch
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * batch
        joint_dim = self.transformer.config.joint_attention_dim

        def encode(texts):
            clip_embeds, pooleds = [], []
            for tok, enc in ((self.tokenizer, self.text_encoder),
                             (self.tokenizer_2, self.text_encoder_2)):
                ids = jnp.asarray(tok(texts)["input_ids"])
                _, pooled, hiddens = enc(ids, output_hidden_states=True)
                clip_embeds.append(hiddens[-2])
                pooleds.append(pooled)
            clip_embed = jnp.concatenate(clip_embeds, axis=-1)
            clip_embed = jnp.pad(clip_embed,
                                 ((0, 0), (0, 0), (0, joint_dim - clip_embed.shape[-1])))
            if self.text_encoder_3 is not None:
                t5_ids = jnp.asarray(self.tokenizer_3(texts)["input_ids"])
                t5_embed = self.text_encoder_3(t5_ids)[0]
            else:
                t5_embed = jnp.zeros((len(texts), t5_seq_len, joint_dim), clip_embed.dtype)
            return (jnp.concatenate([clip_embed, t5_embed], axis=1),
                    jnp.concatenate(pooleds, axis=-1))

        cond, pooled = encode(prompt)
        uncond, neg_pooled = encode(negative_prompt)
        return cond, uncond, pooled, neg_pooled

    def _decode_latents(self, latents):
        cfg = self.vae.config
        latents = latents / cfg.scaling_factor
        if cfg.shift_factor:
            latents = latents + cfg.shift_factor
        decode = self._jit.get(("decode", latents.shape), lambda: jax.jit(
            lambda p, z: self.vae.module.apply({"params": p}, z.astype(self.vae.dtype),
                                               method=self.vae.module.decode)))
        return decode(self.vae.params, latents).astype(jnp.float32)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond, pooled, neg_pooled = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        pooled_all = jnp.concatenate([neg_pooled, pooled]) if do_cfg else pooled

        lat_ch = self.transformer.config.in_channels
        shape = (batch, height // self.vae_scale_factor, width // self.vae_scale_factor, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)

        transformer, scheduler = self.transformer, self.scheduler

        def build():
            def denoise(params, latents, context, pooled_all, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = transformer.module.apply(
                        {"params": params}, lat_in.astype(transformer.dtype), t_in,
                        context.astype(transformer.dtype),
                        pooled_all.astype(transformer.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                latents_out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                                   (latents, state))
                return latents_out

            return jax.jit(denoise)

        denoise = self._jit.get(("denoise", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.transformer.params, latents, context, pooled_all, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class DiTPipeline(DiffusionPipeline):
    """Class-conditional DiT sampling (reference ppdiffusers/pipelines/dit)."""

    def __init__(self, transformer, vae, scheduler):
        self.register_modules(transformer=transformer, vae=vae, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def __call__(self, class_labels, guidance_scale: float = 4.0,
                 num_inference_steps: int = 25, seed: int = 0, output_type: str = "pil"):
        labels = jnp.asarray(class_labels, jnp.int32)
        batch = labels.shape[0]
        cfg = self.transformer.config
        do_cfg = guidance_scale > 1.0
        null_labels = jnp.full_like(labels, cfg.num_classes)  # CFG null class
        all_labels = jnp.concatenate([labels, null_labels]) if do_cfg else labels

        s = cfg.sample_size
        shape = (batch, s, s, cfg.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        transformer, scheduler = self.transformer, self.scheduler

        def build():
            def denoise(params, latents, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    out = transformer.module.apply(
                        {"params": params}, lat_in.astype(transformer.dtype), t_in,
                        all_labels).astype(jnp.float32)
                    noise_pred = out[..., : cfg.in_channels]
                    if do_cfg:
                        co, un = jnp.split(noise_pred, 2)
                        noise_pred = un + gs * (co - un)
                        noise_pred = jnp.concatenate([noise_pred], axis=0)
                    latents, state = scheduler.step(state, noise_pred, i, latents)
                    return latents, state

                latents_out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                                   (latents, state))
                return latents_out

            return jax.jit(denoise)

        denoise = self._jit.get(("denoise", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.transformer.params, latents, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        z = latents / self.vae.config.scaling_factor
        image = self.vae.decode(z.astype(self.vae.dtype)).astype(jnp.float32)
        return (self.image_processor.postprocess(image, output_type),)
