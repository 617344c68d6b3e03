"""unCLIP / Karlo text-to-image (reference
ppdiffusers/pipelines/unclip/pipeline_unclip.py + text_proj.py):
prior (text -> CLIP image embedding) -> decoder (64px, image-embed
conditioned) -> super-resolution. Schedulers are UnCLIPScheduler instances;
each stage's loop jits. The decoder conditioning follows the reference
UnCLIPTextProjModel: the image embedding both ADDS to the time embedding
(UNet addition_embed_type="image") and prepends learned extra context
tokens to the projected text-encoder states."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@dataclasses.dataclass
class UnCLIPTextProjConfig(BaseConfig):
    model_type = "unclip_text_proj"
    clip_embeddings_dim: int = 768
    clip_extra_context_tokens: int = 4
    cross_attention_dim: int = 1536
    time_embed_dim: int = 1536


class UnCLIPTextProjModule(nn.Module):
    """Reference unclip/text_proj.py UnCLIPTextProjModel."""

    config: UnCLIPTextProjConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, prompt_embeds):
        cfg = self.config
        b = image_embeddings.shape[0]
        n = cfg.clip_extra_context_tokens
        # extra context tokens from the image embedding
        extra = nn.Dense(n * cfg.cross_attention_dim, dtype=self.dtype,
                         name="clip_extra_context_tokens_proj")(image_embeddings)
        extra = extra.reshape(b, n, cfg.cross_attention_dim)
        # project the text encoder hidden states to the decoder width
        text_ctx = nn.Dense(cfg.cross_attention_dim, dtype=self.dtype,
                            name="encoder_hidden_states_proj")(prompt_embeds)
        context = jnp.concatenate([extra, text_ctx], axis=1)
        # additive conditioning on the time embedding
        add_emb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype,
                           name="embedding_proj")(image_embeddings)
        return context, add_emb


class UnCLIPTextProjModel(PretrainedModel):
    config_class = UnCLIPTextProjConfig
    module_class = UnCLIPTextProjModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, config.clip_embeddings_dim)),
                jnp.zeros((1, 8, config.clip_embeddings_dim))), {}

    def __call__(self, image_embeddings, prompt_embeds):
        return self.module.apply({"params": self.params},
                                 image_embeddings.astype(self.dtype),
                                 prompt_embeds.astype(self.dtype))


@register_pipeline
class UnCLIPPipeline(DiffusionPipeline):
    def __init__(self, prior, decoder, text_proj, text_encoder, tokenizer,
                 prior_scheduler, decoder_scheduler,
                 super_res_first=None, super_res_scheduler=None):
        self.register_modules(
            prior=prior, decoder=decoder, text_proj=text_proj,
            text_encoder=text_encoder, tokenizer=tokenizer,
            prior_scheduler=prior_scheduler,
            decoder_scheduler=decoder_scheduler,
            super_res_first=super_res_first,
            super_res_scheduler=super_res_scheduler)
        self._jit = _JitCache()

    def _run_prior(self, seq, pooled, steps, guidance_scale, key):
        do_cfg = guidance_scale > 1.0
        b = pooled.shape[0]
        d = self.prior.config.embedding_dim
        seq_all = jnp.concatenate([jnp.zeros_like(seq), seq]) if do_cfg else seq
        pooled_all = jnp.concatenate([jnp.zeros_like(pooled), pooled]) if do_cfg else pooled
        latents = jax.random.normal(key, (b, d), jnp.float32)
        state = self.prior_scheduler.set_timesteps(steps)
        prior, scheduler = self.prior, self.prior_scheduler

        def build():
            def run(params, latents, seq_all, pooled_all, state, gs, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = prior.module.apply(
                        {"params": params}, lat_in.astype(prior.dtype), t_in,
                        pooled_all.astype(prior.dtype),
                        seq_all.astype(prior.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents, key=sub)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, steps, body, (latents, state, key))
                return out

            return jax.jit(run)

        return self._jit.get(("unclip_prior", (b, d), steps, do_cfg), build)(
            prior.params, latents, seq_all, pooled_all, state,
            jnp.asarray(guidance_scale, jnp.float32), key)

    def __call__(self, prompt, num_inference_steps: int = 25,
                 prior_num_inference_steps: int = 25,
                 super_res_num_inference_steps: int = 7,
                 prior_guidance_scale: float = 4.0,
                 decoder_guidance_scale: float = 8.0, seed: int = 0,
                 output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        key = jax.random.PRNGKey(seed)
        k_prior, k_dec, k_dec_loop, k_sr, k_sr_loop = jax.random.split(key, 5)

        enc = self.tokenizer(prompt)
        seq, pooled = self.text_encoder(jnp.asarray(enc["input_ids"]))[:2]

        image_embeds = self._run_prior(seq, pooled, prior_num_inference_steps,
                                       prior_guidance_scale, k_prior)

        # decoder conditioning via text_proj
        do_cfg = decoder_guidance_scale > 1.0
        context, add_emb = self.text_proj(image_embeds, seq)
        if do_cfg:
            u_context, u_add = self.text_proj(jnp.zeros_like(image_embeds),
                                              jnp.zeros_like(seq))
            context = jnp.concatenate([u_context, context])
            add_emb = jnp.concatenate([u_add, add_emb])

        b = image_embeds.shape[0]
        s = self.decoder.config.sample_size
        shape = (b, s, s, self.decoder.config.in_channels)
        latents = jax.random.normal(k_dec, shape, jnp.float32)
        state = self.decoder_scheduler.set_timesteps(num_inference_steps)
        decoder, scheduler = self.decoder, self.decoder_scheduler

        def build_dec():
            def run(params, latents, context, add_emb, state, gs, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = decoder.module.apply(
                        {"params": params}, lat_in.astype(decoder.dtype), t_in,
                        context.astype(decoder.dtype),
                        added_cond_kwargs={"image_embeds": add_emb}).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents, key=sub)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, key))
                return out

            return jax.jit(run)

        latents = self._jit.get(("unclip_dec", shape, num_inference_steps,
                                 do_cfg), build_dec)(
            decoder.params, latents, context, add_emb, state,
            jnp.asarray(decoder_guidance_scale, jnp.float32), k_dec_loop)

        image = latents
        if self.super_res_first is not None:
            sr = self.super_res_first
            s_hi = sr.config.sample_size
            low_up = jax.image.resize(image, (b, s_hi, s_hi, image.shape[-1]),
                                      "bicubic")
            sr_shape = (b, s_hi, s_hi, sr.config.in_channels - image.shape[-1])
            sr_lat = jax.random.normal(k_sr, sr_shape, jnp.float32)
            sr_state = self.super_res_scheduler.set_timesteps(
                super_res_num_inference_steps)
            sr_sched = self.super_res_scheduler
            d = sr.config.cross_attention_dim
            d = d if isinstance(d, int) else d[0]
            dummy = jnp.zeros((b, 1, d), jnp.float32)

            def build_sr():
                def run(params, lat, low_up, state, key):
                    def body(i, carry):
                        lat, state, key = carry
                        key, sub = jax.random.split(key)
                        t = state.timesteps[i]
                        lat_in = jnp.concatenate([lat, low_up], axis=-1)
                        pred = sr.module.apply(
                            {"params": params}, lat_in.astype(sr.dtype), t,
                            dummy.astype(sr.dtype)).astype(jnp.float32)
                        lat, state = sr_sched.step(state, pred, i, lat, key=sub)
                        return lat, state, key

                    out, _, _ = jax.lax.fori_loop(
                        0, super_res_num_inference_steps, body, (lat, state, key))
                    return out

                return jax.jit(run)

            image = self._jit.get(("unclip_sr", sr_shape,
                                   super_res_num_inference_steps), build_sr)(
                sr.params, sr_lat, low_up, sr_state, k_sr_loop)

        out = np.asarray(jnp.clip(image / 2 + 0.5, 0, 1))
        return (out,)
