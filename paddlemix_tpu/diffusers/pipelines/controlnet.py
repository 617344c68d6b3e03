"""ControlNet text2img pipeline (reference
ppdiffusers/pipelines/controlnet/pipeline_controlnet.py): control residuals
computed inside the same jitted denoise loop."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import register_pipeline
from .stable_diffusion import StableDiffusionPipeline


@register_pipeline
class StableDiffusionControlNetPipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, controlnet, scheduler,
                 safety_checker=None, feature_extractor=None, image_encoder=None,
                 requires_safety_checker: bool = False):
        super().__init__(vae, text_encoder, tokenizer, unet, scheduler,
                         safety_checker, feature_extractor)
        self.controlnet = controlnet
        self._components["controlnet"] = controlnet

    def __call__(  # type: ignore[override]
        self,
        prompt: Union[str, List[str]] = None,
        image=None,  # control image
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        controlnet_conditioning_scale: float = 1.0,
        negative_prompt=None,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond_emb, uncond_emb = self.encode_prompt(prompt, negative_prompt)
        batch = cond_emb.shape[0]
        context = jnp.concatenate([uncond_emb, cond_emb]) if do_cfg else cond_emb

        control = np.asarray(image, np.float32)
        if control.max() > 1.5:
            control = control / 255.0
        if control.ndim == 3:
            control = control[None]
        control = jnp.asarray(control)
        if control.shape[0] != batch:
            control = jnp.broadcast_to(control, (batch, *control.shape[1:]))
        control_in = jnp.concatenate([control, control]) if do_cfg else control

        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.vae_scale_factor, width // self.vae_scale_factor, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma

        unet, controlnet, scheduler = self.unet, self.controlnet, self.scheduler
        cscale = float(controlnet_conditioning_scale)

        def build():
            def denoise(unet_params, cn_params, latents, context, control_in, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    down_res, mid_res = controlnet.module.apply(
                        {"params": cn_params}, lat_in.astype(controlnet.dtype), t_in,
                        context.astype(controlnet.dtype),
                        control_in.astype(controlnet.dtype), cscale)
                    pred = unet.module.apply(
                        {"params": unet_params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        down_block_additional_residuals=down_res,
                        mid_block_additional_residual=mid_res).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                latents_out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                                   (latents, state))
                return latents_out

            return jax.jit(denoise)

        denoise = self._jit.get(("cn", shape, num_inference_steps, do_cfg, cscale), build)
        latents = denoise(self.unet.params, self.controlnet.params, latents, context,
                          control_in, state, jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
