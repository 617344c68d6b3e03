"""Latent-diffusion originals + small sampler pipelines.

Rebuilds of the reference's pipelines/latent_diffusion (LDM text-to-image
with the BERT text encoder), latent_diffusion_uncond, pndm,
latent_consistency_models, score_sde_ve and stochastic_karras_ve families.
Each denoise loop is one jitted fori_loop."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache
from .unconditional import DDPMPipeline, _dummy_context


@register_pipeline
class LDMTextToImagePipeline(DiffusionPipeline):
    """The original LDM text-to-image (reference
    pipeline_latent_diffusion.py): BERT-family text encoder + VQ/KL VAE."""

    def __init__(self, vqvae, bert, tokenizer, unet, scheduler):
        self.register_modules(vqvae=vqvae, bert=bert, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, prompt, height: int = 256, width: int = 256,
                 num_inference_steps: int = 50, guidance_scale: float = 1.0,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        do_cfg = guidance_scale > 1.0
        enc = self.tokenizer(prompt)
        cond = self.bert(jnp.asarray(enc["input_ids"]))[0]
        if do_cfg:
            un = self.tokenizer([""] * len(prompt))
            uncond = self.bert(jnp.asarray(un["input_ids"]))[0]
            # pad shorter sequence so rows concatenate (LDM pads to max)
            if uncond.shape[1] != cond.shape[1]:
                m = max(uncond.shape[1], cond.shape[1])
                uncond = jnp.pad(uncond, ((0, 0), (0, m - uncond.shape[1]), (0, 0)))
                cond = jnp.pad(cond, ((0, 0), (0, m - cond.shape[1]), (0, 0)))
            context = jnp.concatenate([uncond, cond])
        else:
            context = cond

        b = cond.shape[0]
        # latent resolution from the VAE downscale factor
        f = 2 ** (len(self.vqvae.config.block_out_channels) - 1)
        shape = (b, height // f, width // f, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
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
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("ldm_t2i", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        dec = self.vqvae.decode(latents.astype(self.vqvae.dtype)).astype(jnp.float32)
        return (np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1)),)


@register_pipeline
class LDMPipeline(DiffusionPipeline):
    """Unconditional latent diffusion (reference
    latent_diffusion_uncond/pipeline_latent_diffusion_uncond.py)."""

    def __init__(self, vqvae, unet, scheduler):
        self.register_modules(vqvae=vqvae, unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 seed: int = 0, output_type: str = "np"):
        s = self.unet.config.sample_size
        shape = (batch_size, s, s, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, batch_size)

        def build():
            def run(params, latents, state):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    eps = unet.module.apply({"params": params},
                                            latents.astype(unet.dtype), t,
                                            ctx.astype(unet.dtype)).astype(jnp.float32)
                    latents, state = scheduler.step(state, eps, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(run)

        latents = self._jit.get(("ldm_uncond", shape, num_inference_steps),
                                build)(self.unet.params, latents, state)
        dec = self.vqvae.decode(latents.astype(self.vqvae.dtype)).astype(jnp.float32)
        return (np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1)),)


@register_pipeline
class PNDMPipeline(DDPMPipeline):
    """Unconditional PNDM sampling (reference pndm/pipeline_pndm.py) — the
    DDPM loop with a PNDMScheduler (its state carries the eps history)."""


@register_pipeline
class LatentConsistencyModelPipeline(DiffusionPipeline):
    """LCM text-to-image (reference
    latent_consistency_models/pipeline_latent_consistency_text2img.py):
    4-8 steps, no CFG batch; LCMScheduler injects the consistency noise at
    each boundary. (The reference additionally feeds a w-embedding through
    the UNet's time_cond_proj_dim for guidance-embedded checkpoints.)"""

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler):
        self.register_modules(vae=vae, text_encoder=text_encoder,
                              tokenizer=tokenizer, unet=unet, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def __call__(self, prompt, height: int = 512, width: int = 512,
                 num_inference_steps: int = 4, guidance_scale: float = 8.0,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        context = self.text_encoder(ids)[0]
        b = context.shape[0]
        shape = (b, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        latents = jax.random.normal(sub, shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    pred = unet.module.apply(
                        {"params": params}, latents.astype(unet.dtype), t,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    latents, state = scheduler.step(state, pred, i, latents,
                                                    key=sub)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, key))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("lcm", shape, num_inference_steps), build)(
            self.unet.params, latents, context, state, key)
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        return (np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1)),)


@register_pipeline
class ScoreSdeVePipeline(DiffusionPipeline):
    """VE-SDE predictor-corrector sampling (reference
    score_sde_ve/pipeline_score_sde_ve.py)."""

    def __init__(self, unet, scheduler):
        self.register_modules(unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 100,
                 seed: int = 0, output_type: str = "np"):
        s = self.unet.config.sample_size
        shape = (batch_size, s, s, self.unet.config.in_channels)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        state = self.scheduler.set_timesteps(num_inference_steps)
        sample = jax.random.normal(sub, shape, jnp.float32) * \
            self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, batch_size)
        correct_steps = scheduler.config.correct_steps

        def build():
            def run(params, sample, state, key):
                def model(x, sigma):
                    t_in = jnp.broadcast_to(sigma, (x.shape[0],))
                    return unet.module.apply({"params": params},
                                             x.astype(unet.dtype), t_in,
                                             ctx.astype(unet.dtype)).astype(jnp.float32)

                def body(i, carry):
                    sample, key = carry
                    sigma = state.sigmas[i]

                    def corr(j, c):
                        sample, key = c
                        key, sub = jax.random.split(key)
                        score = model(sample, sigma)
                        sample, _ = scheduler.step_correct(state, score,
                                                           sample, sub)
                        return sample, key

                    sample, key = jax.lax.fori_loop(0, correct_steps, corr,
                                                    (sample, key))
                    key, sub = jax.random.split(key)
                    score = model(sample, sigma)
                    sample, mean, _ = scheduler.step_pred(state, score, i,
                                                          sample, sub)
                    return sample, key

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (sample, key))
                return out

            return jax.jit(run)

        out = self._jit.get(("sde_ve", shape, num_inference_steps), build)(
            self.unet.params, sample, state, key)
        return (np.asarray(jnp.clip(out / 2 + 0.5, 0, 1)),)


@register_pipeline
class KarrasVePipeline(DiffusionPipeline):
    """Stochastic churn sampler (reference
    stochastic_karras_ve/pipeline_stochastic_karras_ve.py)."""

    def __init__(self, unet, scheduler):
        self.register_modules(unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 30,
                 seed: int = 0, output_type: str = "np"):
        s = self.unet.config.sample_size
        shape = (batch_size, s, s, self.unet.config.in_channels)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        state = self.scheduler.set_timesteps(num_inference_steps)
        sample = jax.random.normal(sub, shape, jnp.float32) * \
            self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, batch_size)

        def build():
            def run(params, sample, state, key):
                def model(x, sigma):
                    t_in = jnp.broadcast_to(sigma, (x.shape[0],))
                    return unet.module.apply({"params": params},
                                             x.astype(unet.dtype), t_in,
                                             ctx.astype(unet.dtype)).astype(jnp.float32)

                def body(i, carry):
                    sample, key = carry
                    key, sub = jax.random.split(key)
                    sample_hat, sigma_hat = scheduler.add_noise_to_input(
                        state, sample, i, sub)
                    out = model(sample_hat, sigma_hat)
                    prev, derivative, _ = scheduler.step(state, out, i,
                                                         sample_hat,
                                                         sigma_hat=sigma_hat)
                    sigma_next = state.sigmas[i + 1]

                    def correct(prev):
                        out2 = model(prev, sigma_next)
                        corrected, _ = scheduler.step_correct(
                            state, out2, i, sample_hat, prev, derivative,
                            sigma_hat=sigma_hat)
                        return corrected

                    prev = jax.lax.cond(sigma_next > 0, correct,
                                        lambda p: p, prev)
                    return prev, key

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (sample, key))
                return out

            return jax.jit(run)

        out = self._jit.get(("karras_ve", shape, num_inference_steps), build)(
            self.unet.params, sample, state, key)
        return (np.asarray(jnp.clip(out / 2 + 0.5, 0, 1)),)
