"""Dance Diffusion: unconditional audio generation (reference
ppdiffusers/pipelines/dance_diffusion/pipeline_dance_diffusion.py): UNet1D
denoises raw stereo waveforms; one jitted fori_loop like every other
pipeline here."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class DanceDiffusionPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        self.register_modules(unet=unet, scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 audio_length_in_s: float = None, sample_rate: int = 16000,
                 seed: int = 0, output_type: str = "np"):
        length = self.unet.config.sample_size
        if audio_length_in_s is not None:
            length = int(audio_length_in_s * sample_rate)
            # keep the length resample-friendly: multiple of 2^(levels+1)
            mult = 2 ** (len(self.unet.config.block_out_channels) + 1)
            length = max((length // mult) * mult, mult)
        shape = (batch_size, length, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, state):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = scheduler.scale_model_input(state, latents, i)
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype),
                        jnp.broadcast_to(t, (latents.shape[0],))
                    ).astype(jnp.float32)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        audio = self._jit.get(("dance", shape, num_inference_steps), build)(
            self.unet.params, latents, state)
        audio = jnp.clip(audio, -1, 1)
        # (B, L, C) -> (B, C, L) to match the reference's output layout
        return (np.asarray(audio).transpose(0, 2, 1),)
