"""Kandinsky 3 text-to-image (reference
ppdiffusers/pipelines/kandinsky3/pipeline_kandinsky3.py): Flan-T5 encoder
states -> Kandinsky3UNet denoise -> MoVQ decode."""

from __future__ import annotations

from typing import List, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class Kandinsky3Pipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, unet, scheduler, movq):
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              unet=unet, scheduler=scheduler, movq=movq)
        self.movq_scale_factor = 2 ** (len(movq.config.block_out_channels) - 1) if movq else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.movq_scale_factor)
        self._jit = _JitCache()

    def encode_prompt(self, prompt):
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        out = self.text_encoder(ids)
        return out[0] if isinstance(out, tuple) else out

    def __call__(self, prompt: Union[str, List[str]], negative_prompt=None,
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 25, guidance_scale: float = 3.0,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        do_cfg = guidance_scale > 1.0
        ctx = self.encode_prompt(prompt)
        if do_cfg:
            ctx = jnp.concatenate([self.encode_prompt(negative_prompt), ctx])

        b = len(prompt)
        lat_ch = self.unet.config.in_channels
        shape = (b, height // self.movq_scale_factor,
                 width // self.movq_scale_factor, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, ctx, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        ctx.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("k3", shape, num_inference_steps, do_cfg),
                                build)(unet.params, latents, ctx, state,
                                       jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self.movq.decode(latents.astype(self.movq.dtype)).astype(jnp.float32)
        return (self.image_processor.postprocess(np.asarray(image), output_type),)
