"""AudioLDM text-to-audio pipeline.

Rebuild of the reference audio pipelines (ppdiffusers/pipelines/audioldm +
paddlemix/models/audioldm2): text encoder -> latent UNet denoise (same jitted
fori_loop core) -> mel VAE decode -> HiFi-GAN vocoder waveform. The reference's
CLAP text tower is served by the CLIP text encoder class here (identical
architecture family); AudioLDM2's GPT-2 projection stack is ⬜."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class AudioLDMPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler, vocoder):
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler, vocoder=vocoder)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        # CLAP-style: pooled text embedding conditions the UNet via cross-attn
        # on a single token
        _, cond = self.text_encoder(jnp.asarray(self.tokenizer(prompt)["input_ids"]))
        _, uncond = self.text_encoder(jnp.asarray(self.tokenizer(negative_prompt)["input_ids"]))
        norm = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return norm(cond)[:, None, :], norm(uncond)[:, None, :]

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        audio_length_in_s: float = 5.12,
        num_inference_steps: int = 10,
        guidance_scale: float = 2.5,
        negative_prompt=None,
        seed: int = 0,
        output_type: str = "np",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        hop = self.vocoder.config.hop_length if self.vocoder else 1024
        sample_rate = 16000
        mel_frames = int(audio_length_in_s * sample_rate / hop)
        lat_t = max(self.vae_scale_factor,
                    (mel_frames // self.vae_scale_factor) * 1) // 1
        lat_t = max(mel_frames // self.vae_scale_factor, 1)
        lat_f = self.vocoder.config.model_in_dim // self.vae_scale_factor if self.vocoder else 8
        shape = (batch, lat_t, lat_f, self.unet.config.in_channels)
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
                    pred = unet.module.apply({"params": params}, lat_in.astype(unet.dtype),
                                             t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body, (latents, state))
                return out

            return jax.jit(denoise)

        denoise = self._jit.get(("denoise", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        mel = self.vae.decode((latents / self.vae.config.scaling_factor
                               ).astype(self.vae.dtype)).astype(jnp.float32)
        mel = mel[..., 0] if mel.shape[-1] == 1 else mel.mean(-1)
        audio = self.vocoder.decode(mel.astype(self.vocoder.dtype)).astype(jnp.float32)
        return (np.asarray(audio),)
