"""Semantic guidance (SEGA) + Safe Latent Diffusion pipelines.

Rebuilds of the reference's
pipelines/semantic_stable_diffusion/pipeline_semantic_stable_diffusion.py
(:520-690 edit-concept guidance: per-concept warmup/cooldown, quantile
thresholding, reverse direction, momentum) and
pipelines/stable_diffusion_safe/pipeline_stable_diffusion_safe.py (:442-478
safety guidance with clamp/threshold/momentum).

TPU design: the whole loop including momentum state jits — per-concept
warmup/cooldown gates become jnp.where on the step index, the quantile
threshold is jnp.quantile over flattened |guidance| (static shapes), and
momentum is a loop-carried array."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionPipeline


def _per_concept(v, n, default):
    if v is None:
        v = default
    if isinstance(v, (int, float, bool)):
        return jnp.asarray([v] * n, jnp.float32)
    return jnp.asarray(list(v), jnp.float32)


@register_pipeline
class SemanticStableDiffusionPipeline(StableDiffusionPipeline):
    """SEGA: steer generation along edit-concept directions."""

    def __call__(self, prompt, editing_prompt: Optional[Sequence[str]] = None,
                 reverse_editing_direction: Union[bool, Sequence[bool]] = False,
                 edit_guidance_scale: Union[float, Sequence[float]] = 5.0,
                 edit_warmup_steps: Union[int, Sequence[int]] = 10,
                 edit_cooldown_steps: Optional[Union[int, Sequence[int]]] = None,
                 edit_threshold: Union[float, Sequence[float]] = 0.9,
                 edit_momentum_scale: float = 0.1, edit_mom_beta: float = 0.4,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0, output_type: str = "np",
                 latents: Optional[jnp.ndarray] = None):
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        edits = list(editing_prompt or [])
        n_edit = len(edits)
        edit_embeds = []
        for e in edits:
            ec, _ = self.encode_prompt([e] * batch)
            edit_embeds.append(ec)
        # context rows: [uncond, text, edit_0, ..., edit_{n-1}] per sample
        context = jnp.concatenate([uncond, cond] + edit_embeds)

        gs_c = _per_concept(edit_guidance_scale, n_edit, 5.0)
        warm_c = _per_concept(edit_warmup_steps, n_edit, 10)
        cool_c = _per_concept(edit_cooldown_steps, n_edit,
                              num_inference_steps + 1)
        thr_c = _per_concept(edit_threshold, n_edit, 0.9)
        rev_c = _per_concept(reverse_editing_direction, n_edit, 0.0)

        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                        jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, gs):
                mom0 = jnp.zeros(shape, jnp.float32)

                def body(i, carry):
                    latents, state, momentum = carry
                    lat_in = jnp.concatenate([latents] * (2 + n_edit))
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t = state.timesteps[i]
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    preds = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    chunks = jnp.split(preds, 2 + n_edit)
                    p_un, p_txt = chunks[0], chunks[1]
                    guidance = gs * (p_txt - p_un)
                    edit_sum = jnp.zeros_like(guidance)
                    for c in range(n_edit):
                        g = (chunks[2 + c] - p_un) * jnp.where(rev_c[c] > 0,
                                                               -1.0, 1.0)
                        g = g * gs_c[c]
                        # quantile threshold per sample (reference :630-648)
                        flat = jnp.abs(g).reshape(batch, -1)
                        tmp = jnp.quantile(flat, thr_c[c], axis=1)
                        g = jnp.where(jnp.abs(g) >= tmp[:, None, None, None],
                                      g, 0.0)
                        active = (i >= warm_c[c]) & (i < cool_c[c])
                        edit_sum = edit_sum + jnp.where(active, g, 0.0)
                    if n_edit:
                        edit_sum = edit_sum / n_edit
                        edit_sum = edit_sum + edit_momentum_scale * momentum
                        momentum = edit_mom_beta * momentum + \
                            (1 - edit_mom_beta) * edit_sum
                        guidance = guidance + edit_sum
                    noise_pred = p_un + guidance
                    latents, state = scheduler.step(state, noise_pred, i, latents)
                    return latents, state, momentum

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, mom0))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("sega", shape, num_inference_steps, n_edit),
                                build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


class SafetyConfig:
    """Preset SLD strengths (reference
    ppdiffusers/pipelines/stable_diffusion_safe/__init__.py:35-63):
    ``pipe(prompt, **SafetyConfig.STRONG)``."""

    WEAK = {"sld_warmup_steps": 15, "sld_guidance_scale": 20,
            "sld_threshold": 0.0, "sld_momentum_scale": 0.0, "sld_mom_beta": 0.0}
    MEDIUM = {"sld_warmup_steps": 10, "sld_guidance_scale": 1000,
              "sld_threshold": 0.01, "sld_momentum_scale": 0.3, "sld_mom_beta": 0.4}
    STRONG = {"sld_warmup_steps": 7, "sld_guidance_scale": 2000,
              "sld_threshold": 0.025, "sld_momentum_scale": 0.5, "sld_mom_beta": 0.7}
    MAX = {"sld_warmup_steps": 0, "sld_guidance_scale": 5000,
           "sld_threshold": 1.0, "sld_momentum_scale": 0.5, "sld_mom_beta": 0.7}


@register_pipeline
class StableDiffusionPipelineSafe(StableDiffusionPipeline):
    """Safe Latent Diffusion: guidance away from a safety concept."""

    SAFETY_CONCEPT = ("an image showing hate, harassment, violence, suffering, "
                      "humiliation, harm, suicide, sexual, nudity, bodily "
                      "fluids, blood, obscene gestures, illegal activity, drug "
                      "use, theft, vandalism, weapons, child abuse, brutality, "
                      "cruelty")

    def __call__(self, prompt, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 negative_prompt=None, sld_guidance_scale: float = 1000.0,
                 sld_warmup_steps: int = 10, sld_threshold: float = 0.01,
                 sld_momentum_scale: float = 0.3, sld_mom_beta: float = 0.4,
                 seed: int = 0, output_type: str = "np",
                 latents: Optional[jnp.ndarray] = None):
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        safety, _ = self.encode_prompt([self.SAFETY_CONCEPT] * batch)
        enable_sld = sld_guidance_scale > 1.0
        context = jnp.concatenate([uncond, cond] +
                                  ([safety] if enable_sld else []))

        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                        jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler
        n_rows = 3 if enable_sld else 2

        def build():
            def denoise(params, latents, context, state, gs):
                mom0 = jnp.zeros(shape, jnp.float32)

                def body(i, carry):
                    latents, state, momentum = carry
                    lat_in = jnp.concatenate([latents] * n_rows)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t = state.timesteps[i]
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    preds = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    chunks = jnp.split(preds, n_rows)
                    p_un, p_txt = chunks[0], chunks[1]
                    guidance = p_txt - p_un
                    if enable_sld:
                        p_safe = chunks[2]
                        # reference pipeline_stable_diffusion_safe.py:454-478
                        scale = jnp.clip(jnp.abs(p_txt - p_safe) *
                                         sld_guidance_scale, 0.0, 1.0)
                        safety_dir = jnp.where(
                            (p_txt - p_safe) >= sld_threshold, 0.0, scale)
                        g_safety = (p_safe - p_un) * safety_dir
                        g_safety = g_safety + sld_momentum_scale * momentum
                        momentum = sld_mom_beta * momentum + \
                            (1 - sld_mom_beta) * g_safety
                        guidance = guidance - jnp.where(i >= sld_warmup_steps,
                                                        g_safety, 0.0)
                    noise_pred = p_un + gs * guidance
                    latents, state = scheduler.step(state, noise_pred, i, latents)
                    return latents, state, momentum

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, mom0))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("sld", shape, num_inference_steps, enable_sld),
                                build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)
