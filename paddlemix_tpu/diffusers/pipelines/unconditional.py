"""Unconditional / specialty sampling pipelines.

Rebuilds of the reference's ppdiffusers/pipelines/ddpm/pipeline_ddpm.py,
ddim/pipeline_ddim.py, repaint/pipeline_repaint.py,
consistency_models/pipeline_consistency_models.py and
latent_diffusion/pipeline_latent_diffusion_superresolution.py.

All use the UNet2DConditionModel configured with plain Down/UpBlock2D stacks
(no cross-attention) — a zero context tensor is threaded through untouched.
RePaint's denoise/undo time-travel dispatches through lax.cond inside one
fori_loop, so the whole inpainting schedule jits."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache


def _dummy_context(unet, batch):
    d = unet.config.cross_attention_dim
    d = d if isinstance(d, int) else d[0]
    return jnp.zeros((batch, 1, d), jnp.float32)


@register_pipeline
class DDPMPipeline(DiffusionPipeline):
    """Ancestral sampling from an unconditional UNet (reference
    pipeline_ddpm.py)."""

    def __init__(self, unet, scheduler):
        self.register_modules(unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 seed: int = 0, output_type: str = "np"):
        s = self.unet.config.sample_size
        ch = self.unet.config.in_channels
        shape = (batch_size, s, s, ch)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        sample = jax.random.normal(sub, shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, batch_size)

        def build():
            def run(params, sample, state, key):
                def body(i, carry):
                    sample, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    eps = unet.module.apply({"params": params},
                                            sample.astype(unet.dtype), t,
                                            ctx.astype(unet.dtype)).astype(jnp.float32)
                    sample, state = scheduler.step(state, eps, i, sample, key=sub)
                    return sample, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (sample, state, key))
                return out

            return jax.jit(run)

        out = self._jit.get(("ddpm", shape, num_inference_steps), build)(
            self.unet.params, sample, state, key)
        img = np.asarray(jnp.clip(out / 2 + 0.5, 0, 1))
        return (img,)


@register_pipeline
class DDIMPipeline(DDPMPipeline):
    """Deterministic DDIM sampling (reference pipeline_ddim.py); same loop, a
    DDIM scheduler and no noise key needed (eta=0 is our DDIM default)."""


@register_pipeline
class RePaintPipeline(DiffusionPipeline):
    """Inpainting by resampling (RePaint; reference pipeline_repaint.py): the
    jump schedule (denoise + undo re-noising revisits) from
    RePaintScheduler.set_timesteps runs as ONE fori_loop with lax.cond
    dispatching denoise vs undo per position."""

    def __init__(self, unet, scheduler):
        self.register_modules(unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, image, mask_image, num_inference_steps: int = 50,
                 jump_length: int = 10, jump_n_sample: int = 10, seed: int = 0,
                 output_type: str = "np"):
        img = jnp.asarray(np.asarray(image, np.float32))
        if img.max() > 1.5:
            img = img / 127.5 - 1.0
        if img.ndim == 3:
            img = img[None]
        mask = jnp.asarray(np.asarray(mask_image, np.float32))
        if mask.ndim == 2:
            mask = mask[None, :, :, None]
        elif mask.ndim == 3:
            mask = mask[None] if mask.shape[-1] in (1, 3) else mask[..., None]
        mask = (mask[..., :1] > 0.5).astype(jnp.float32)  # 1 = known/keep

        state = self.scheduler.set_timesteps(num_inference_steps,
                                             jump_length=jump_length,
                                             jump_n_sample=jump_n_sample)
        n = int(state.timesteps.shape[0])
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        sample = jax.random.normal(sub, img.shape, jnp.float32)
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, img.shape[0])

        def build():
            def run(params, sample, original, mask, state, key):
                def body(i, carry):
                    sample, key = carry
                    key, sub = jax.random.split(key)

                    def denoise(x):
                        t = state.timesteps[i]
                        eps = unet.module.apply(
                            {"params": params}, x.astype(unet.dtype), t,
                            ctx.astype(unet.dtype)).astype(jnp.float32)
                        out, _ = scheduler.step(state, eps, i, x, original,
                                                mask, sub)
                        return out

                    def undo(x):
                        out, _ = scheduler.undo_step(state, i, x, sub)
                        return out

                    sample = jax.lax.cond(state.is_undo[i], undo, denoise, sample)
                    return sample, key

                out, _ = jax.lax.fori_loop(0, n, body, (sample, key))
                return out

            return jax.jit(run)

        out = self._jit.get(("repaint", img.shape, n), build)(
            self.unet.params, sample, img, mask, state, key)
        img_out = np.asarray(jnp.clip(out / 2 + 0.5, 0, 1))
        return (img_out,)


@register_pipeline
class ConsistencyModelPipeline(DiffusionPipeline):
    """One/few-step consistency model sampling (reference
    pipeline_consistency_models.py) with CMStochasticIterativeScheduler."""

    def __init__(self, unet, scheduler):
        self.register_modules(unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 1,
                 class_labels=None, seed: int = 0, output_type: str = "np"):
        s = self.unet.config.sample_size
        ch = self.unet.config.in_channels
        shape = (batch_size, s, s, ch)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        state = self.scheduler.set_timesteps(num_inference_steps)
        sample = jax.random.normal(sub, shape, jnp.float32) * \
            self.scheduler.init_noise_sigma
        labels = None if class_labels is None else jnp.asarray(class_labels)
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, batch_size)

        def build():
            def run(params, sample, state, labels, key):
                def body(i, carry):
                    sample, state, key = carry
                    key, sub = jax.random.split(key)
                    sigma = state.timesteps[i]
                    inp = scheduler.scale_model_input(state, sample, i)
                    out = unet.module.apply(
                        {"params": params}, inp.astype(unet.dtype),
                        sigma.astype(jnp.float32),
                        ctx.astype(unet.dtype),
                        class_labels=labels).astype(jnp.float32)
                    sample, state = scheduler.step(state, out, i, sample, key=sub)
                    return sample, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (sample, state, key))
                return out

            return jax.jit(run)

        out = self._jit.get(("cm", shape, num_inference_steps,
                             labels is not None), build)(
            self.unet.params, sample, state, labels, key)
        img = np.asarray(jnp.clip(out / 2 + 0.5, 0, 1))
        return (img,)


@register_pipeline
class LDMSuperResolutionPipeline(DiffusionPipeline):
    """4x latent super-resolution (reference
    pipeline_latent_diffusion_superresolution.py): the low-res image is
    concatenated to the latent channels each step; a VQ-VAE decodes."""

    def __init__(self, vqvae, unet, scheduler):
        self.register_modules(vqvae=vqvae, unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, image, num_inference_steps: int = 50, seed: int = 0,
                 output_type: str = "np"):
        img = jnp.asarray(np.asarray(image, np.float32))
        if img.max() > 1.5:
            img = img / 127.5 - 1.0
        if img.ndim == 3:
            img = img[None]
        b, h, w, _ = img.shape
        lat_ch = self.unet.config.in_channels - img.shape[-1]
        shape = (b, h, w, lat_ch)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        latents = jax.random.normal(sub, shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        ctx = _dummy_context(unet, b)

        def build():
            def run(params, latents, img, state, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    lat_in = scheduler.scale_model_input(state, latents, i)
                    lat_in = jnp.concatenate([lat_in, img], axis=-1)
                    eps = unet.module.apply({"params": params},
                                            lat_in.astype(unet.dtype), t,
                                            ctx.astype(unet.dtype)).astype(jnp.float32)
                    latents, state = scheduler.step(state, eps, i, latents, key=sub)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, key))
                return out

            return jax.jit(run)

        latents = self._jit.get(("ldmsr", shape, num_inference_steps), build)(
            self.unet.params, latents, img, state, key)
        decoded = self.vqvae.decode(latents.astype(self.vqvae.dtype)).astype(jnp.float32)
        img_out = np.asarray(jnp.clip(decoded / 2 + 0.5, 0, 1))
        return (img_out,)
