"""Text-to-video pipeline (reference ppdiffusers/pipelines/
text_to_video_synthesis + animatediff): motion UNet denoise loop over
(B, T, h, w, 4) latents, frames decoded by the image VAE."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class TextToVideoPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler):
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        from ..image_processor import VaeImageProcessor

        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        cond = self.text_encoder(jnp.asarray(self.tokenizer(prompt)["input_ids"]))[0]
        uncond = self.text_encoder(jnp.asarray(self.tokenizer(negative_prompt)["input_ids"]))[0]
        return cond, uncond

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        num_frames: int = 16,
        height: int = 256,
        width: int = 256,
        num_inference_steps: int = 25,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        output_type: str = "np",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        shape = (batch, num_frames, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
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
        b, t = latents.shape[:2]
        flat = latents.reshape(b * t, *latents.shape[2:]) / self.vae.config.scaling_factor
        frames = self.vae.decode(flat.astype(self.vae.dtype)).astype(jnp.float32)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(b, t, *frames.shape[1:]),)


@register_pipeline
class AnimateDiffPipeline(TextToVideoPipeline):
    """Named AnimateDiff entry (reference pipelines/animatediff): the
    TextToVideo loop over the motion UNet, plus motion-adapter loading."""

    def load_motion_adapter(self, path_or_state_dict):
        return self.unet.load_motion_adapter(path_or_state_dict)


@register_pipeline
class HotshotXLPipeline(TextToVideoPipeline):
    """Hotshot-XL (reference pipelines/hotshot_xl): AnimateDiff motion modules
    on the SDXL backbone — the motion UNet carries SDXL text_time added
    conditioning; dual text encoders supply (context, pooled) like SDXL."""

    def __init__(self, vae, text_encoder, text_encoder_2, tokenizer,
                 tokenizer_2, unet, scheduler):
        super().__init__(vae=vae, text_encoder=text_encoder,
                         tokenizer=tokenizer, unet=unet, scheduler=scheduler)
        self.register_modules(text_encoder_2=text_encoder_2,
                              tokenizer_2=tokenizer_2)

    def __call__(self, prompt, num_frames: int = 8, height: int = 512,
                 width: int = 512, num_inference_steps: int = 25,
                 guidance_scale: float = 7.5, negative_prompt=None,
                 seed: int = 0, output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)

        def encode(texts):
            # SDXL convention: penultimate hidden states, pooled from enc 2
            embeds = []
            pooled = None
            for tok, enc in ((self.tokenizer, self.text_encoder),
                             (self.tokenizer_2, self.text_encoder_2)):
                ids = jnp.asarray(tok(texts)["input_ids"])
                _, pooled, hiddens = enc(ids, output_hidden_states=True)
                embeds.append(hiddens[-2])
            return jnp.concatenate(embeds, axis=-1), pooled

        cond, pooled = encode(prompt)
        uncond, un_pooled = encode(negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        text_embeds = jnp.concatenate([un_pooled, pooled]) if do_cfg else pooled
        b = cond.shape[0]
        time_ids = jnp.tile(jnp.asarray(
            [[height, width, 0, 0, height, width]], jnp.float32), (b, 1))
        if do_cfg:
            time_ids = jnp.concatenate([time_ids, time_ids])

        shape = (b, num_frames, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        from .pipeline_utils import make_scheduler_state

        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, text_embeds, time_ids, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        added_cond_kwargs={
                            "text_embeds": text_embeds.astype(unet.dtype),
                            "time_ids": time_ids.astype(unet.dtype),
                        }).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("hotshot", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, context, text_embeds, time_ids, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        bshape = latents.shape
        flat = latents.reshape(bshape[0] * num_frames, *bshape[2:])
        flat = flat / self.vae.config.scaling_factor
        frames = self.vae.decode(flat.astype(self.vae.dtype)).astype(jnp.float32)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(bshape[0], num_frames, *frames.shape[1:]),)


@register_pipeline
class VideoToVideoPipeline(TextToVideoPipeline):
    """Text-guided video-to-video (reference pipelines/video_to_video over the
    modelscope ST UNet): the input clip's per-frame VAE latents are noised to
    ``strength`` and re-denoised under the prompt — the img2img recipe lifted
    to the frame-stacked motion UNet."""

    def __call__(self, prompt, video=None, strength: float = 0.6,
                 num_inference_steps: int = 50, guidance_scale: float = 9.0,
                 negative_prompt=None, seed: int = 0, output_type: str = "np"):
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        do_cfg = guidance_scale > 1.0
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        vid = jnp.asarray(np.asarray(video, np.float32))
        if vid.max() > 1.5:
            vid = vid / 127.5 - 1.0
        if vid.ndim == 4:
            vid = vid[None]  # (B, T, H, W, C)
        b, t = vid.shape[:2]
        flat = vid.reshape(b * t, *vid.shape[2:])
        lat = self.vae.encode(flat.astype(self.vae.dtype)).mode()
        lat = lat.astype(jnp.float32) * self.vae.config.scaling_factor
        lat = lat.reshape(b, t, *lat.shape[1:])

        from .pipeline_utils import make_scheduler_state

        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=lat.shape)
        start = int(num_inference_steps * (1.0 - strength))
        t_start = state.timesteps[start]
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, lat.shape, jnp.float32)
        latents = self.scheduler.add_noise(lat, noise,
                                           jnp.broadcast_to(t_start, (b,)))
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

                out, _ = jax.lax.fori_loop(start, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("vid2vid", lat.shape, num_inference_steps,
                                 start, do_cfg), build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        flat = latents.reshape(b * t, *latents.shape[2:])
        flat = flat / self.vae.config.scaling_factor
        frames = self.vae.decode(flat.astype(self.vae.dtype)).astype(jnp.float32)
        frames = np.asarray(jnp.clip(frames / 2 + 0.5, 0, 1))
        return (frames.reshape(b, t, *frames.shape[1:]),)
