"""Stable Diffusion text-to-image pipelines (SD1.5/2.x and SDXL).

Rebuild of the reference pipelines
(ppdiffusers/pipelines/stable_diffusion/pipeline_stable_diffusion.py:854,
stable_diffusion_xl/pipeline_stable_diffusion_xl.py:1007) with the TPU-native
denoise loop: the entire CFG + UNet + scheduler.step loop compiles to ONE
jitted lax.fori_loop (the reference steps from python per iteration; that
python loop is why its dygraph path is 3.5x slower than static — here there is
no such gap by construction). CFG rides the batch axis, so on a mesh the
cond/uncond halves parallelize across devices like the reference's SD3
batch-parallel trick (pipeline_stable_diffusion_3.py:805-846) for free.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.log import logger
from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline


class _JitCache:
    def __init__(self):
        self._fns = {}

    def get(self, key, builder):
        if key not in self._fns:
            self._fns[key] = builder()
        return self._fns[key]


@register_pipeline
class StableDiffusionPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 safety_checker=None, feature_extractor=None, image_encoder=None,
                 requires_safety_checker: bool = False):
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, safety_checker=safety_checker,
            feature_extractor=feature_extractor,
        )
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    # ------------------------------------------------------------ text
    def encode_prompt(self, prompt, negative_prompt=None, clip_skip: Optional[int] = None):
        if isinstance(prompt, str):
            prompt = [prompt]
        batch = len(prompt)
        negative_prompt = negative_prompt or [""] * batch
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * batch
        ids = self.tokenizer(prompt)["input_ids"]
        neg_ids = self.tokenizer(negative_prompt)["input_ids"]
        if clip_skip:
            _, _, hiddens = self.text_encoder(jnp.asarray(ids), output_hidden_states=True)
            cond = hiddens[-(clip_skip + 1)]
            _, _, neg_hiddens = self.text_encoder(jnp.asarray(neg_ids), output_hidden_states=True)
            uncond = neg_hiddens[-(clip_skip + 1)]
        else:
            cond = self.text_encoder(jnp.asarray(ids))[0]
            uncond = self.text_encoder(jnp.asarray(neg_ids))[0]
        return cond, uncond

    # ------------------------------------------------------------ denoise
    def _build_denoise(self, num_steps: int, do_cfg: bool):
        unet, scheduler = self.unet, self.scheduler

        def denoise(params, latents, context, state, guidance_scale):
            def body(i, carry):
                latents, state = carry
                t = state.timesteps[i]
                lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                lat_in = scheduler.scale_model_input(state, lat_in, i)
                t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                noise_pred = unet.module.apply({"params": params}, lat_in.astype(unet.dtype),
                                               t_in, context.astype(unet.dtype))
                noise_pred = noise_pred.astype(jnp.float32)
                if do_cfg:
                    uncond, cond = jnp.split(noise_pred, 2)
                    noise_pred = uncond + guidance_scale * (cond - uncond)
                latents, state = scheduler.step(state, noise_pred, i, latents)
                return latents, state

            latents, _ = jax.lax.fori_loop(0, num_steps, body, (latents, state))
            return latents

        return jax.jit(denoise)

    def _decode_latents(self, latents):
        cfg = self.vae.config
        latents = latents / cfg.scaling_factor
        if cfg.shift_factor:
            latents = latents + cfg.shift_factor
        decode = self._jit.get(("decode", latents.shape), lambda: jax.jit(
            lambda p, z: self.vae.module.apply({"params": p}, z.astype(self.vae.dtype),
                                               method=self.vae.module.decode)))
        return decode(self.vae.params, latents).astype(jnp.float32)

    @classmethod
    def from_single_file(cls, path: str, **kwargs):
        """Load from one original-LDM checkpoint file (reference
        loaders/single_file.py FromSingleFileMixin)."""
        from ..single_file import load_pipeline_from_single_file

        return load_pipeline_from_single_file(path, pipeline_class=cls, **kwargs)

    def load_ip_adapter(self, path: str, scale: float = 1.0):
        from ..loaders import load_ip_adapter

        self.image_proj_params = load_ip_adapter(self.unet, path, scale=scale)
        self._jit = _JitCache()  # unet module changed; drop stale closures
        return self.image_proj_params

    # ------------------------------------------------------------ call
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        clip_skip: Optional[int] = None,
        return_dict: bool = False,
        ip_adapter_image_embeds: Optional[jnp.ndarray] = None,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt, clip_skip)
        if num_images_per_prompt > 1:
            cond = jnp.repeat(cond, num_images_per_prompt, axis=0)
            uncond = jnp.repeat(uncond, num_images_per_prompt, axis=0)
        if ip_adapter_image_embeds is not None:
            # IP-Adapter: append projected image tokens to the text context
            # (uncond side gets zero-image tokens, reference pipeline behavior)
            from ..loaders import ip_image_tokens

            toks = ip_image_tokens(self.image_proj_params, ip_adapter_image_embeds)
            cond = jnp.concatenate([cond, toks.astype(cond.dtype)], axis=1)
            zero = ip_image_tokens(self.image_proj_params,
                                   jnp.zeros_like(ip_adapter_image_embeds))
            uncond = jnp.concatenate([uncond, zero.astype(uncond.dtype)], axis=1)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.vae_scale_factor, width // self.vae_scale_factor, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        denoise = self._jit.get(("denoise", shape, num_inference_steps, do_cfg),
                                lambda: self._build_denoise(num_inference_steps, do_cfg))
        latents = denoise(self.unet.params, latents, context, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class StableDiffusionXLPipeline(DiffusionPipeline):
    """SDXL: dual text encoders (penultimate hidden states), micro-conditioning
    via add_time_ids (reference pipeline_stable_diffusion_xl.py:1007)."""

    def __init__(self, vae, text_encoder, text_encoder_2, tokenizer, tokenizer_2,
                 unet, scheduler, image_encoder=None, feature_extractor=None,
                 force_zeros_for_empty_prompt: bool = True):
        self.register_modules(
            vae=vae, text_encoder=text_encoder, text_encoder_2=text_encoder_2,
            tokenizer=tokenizer, tokenizer_2=tokenizer_2, unet=unet, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        batch = len(prompt)
        negative_prompt = negative_prompt or [""] * batch
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * batch

        def encode(texts):
            embeds = []
            pooled = None
            for tok, enc in ((self.tokenizer, self.text_encoder),
                             (self.tokenizer_2, self.text_encoder_2)):
                ids = jnp.asarray(tok(texts)["input_ids"])
                _, pool, hiddens = enc(ids, output_hidden_states=True)
                embeds.append(hiddens[-2])  # penultimate layer, SDXL convention
                pooled = pool  # pooled comes from encoder 2
            return jnp.concatenate(embeds, axis=-1), pooled

        cond, pooled = encode(prompt)
        uncond, neg_pooled = encode(negative_prompt)
        return cond, uncond, pooled, neg_pooled

    _build_denoise = StableDiffusionPipeline._build_denoise
    _decode_latents = StableDiffusionPipeline._decode_latents

    def __call__(
        self,
        prompt=None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt=None,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        original_size: Optional[Tuple[int, int]] = None,
        target_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond, pooled, neg_pooled = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        add_time_ids = jnp.asarray(
            [list(original_size) + list(crops_coords_top_left) + list(target_size)],
            jnp.float32)
        add_time_ids = jnp.broadcast_to(add_time_ids, (batch, 6))
        if do_cfg:
            add_text_embeds = jnp.concatenate([neg_pooled, pooled])
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids])
        else:
            add_text_embeds = pooled

        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.vae_scale_factor, width // self.vae_scale_factor, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, add_text_embeds, add_time_ids, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    noise_pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        added_cond_kwargs={"text_embeds": add_text_embeds.astype(unet.dtype),
                                           "time_ids": add_time_ids},
                    ).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(noise_pred, 2)
                        noise_pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, noise_pred, i, latents)
                    return latents, state

                latents_out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return latents_out

            return jax.jit(denoise)

        denoise = self._jit.get(("denoise", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, add_text_embeds,
                          add_time_ids, state, jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class StableDiffusionKDiffusionPipeline(StableDiffusionPipeline):
    """k-diffusion sampler compatibility entry (reference
    pipeline_stable_diffusion_k_diffusion.py wraps the k-diffusion library's
    samplers): here the k-samplers ARE the native scheduler zoo — construct
    with any karras-sigma scheduler (Euler/Heun/LMS/KDPM2/DPM-SDE with
    use_karras_sigmas=True); the loops are identical, so this is a named
    alias kept for model_index.json compatibility."""
