"""HunyuanDiT text-to-image pipeline (reference
ppdiffusers/examples/HunyuanDiT/hydit inference path and
ppdiffusers/pipelines/hunyuandit/pipeline_hunyuandit.py): dual text
streams — CLIP sequence states + T5 states each with their padding masks —
feed the 2D-RoPE U-shaped DiT; epsilon prediction with a learned-variance
head (dropped at sampling), CFG, one jitted fori_loop, VAE decode."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image_processor import VaeImageProcessor
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class HunyuanDiTPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, tokenizer_t5, text_encoder_t5,
                 vae, transformer, scheduler):
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder,
            tokenizer_t5=tokenizer_t5, text_encoder_t5=text_encoder_t5,
            vae=vae, transformer=transformer, scheduler=scheduler)
        self.vae_scale_factor = (2 ** (len(vae.config.block_out_channels) - 1)
                                 if vae else 8)
        self.image_processor = VaeImageProcessor(
            vae_scale_factor=self.vae_scale_factor)
        self._jit = _JitCache()

    def _encode(self, tokenizer, encoder, prompts, max_len):
        enc = tokenizer(prompts)
        ids = np.asarray(enc["input_ids"])[:, :max_len]
        if ids.shape[1] < max_len:
            ids = np.pad(ids, ((0, 0), (0, max_len - ids.shape[1])))
        mask = enc.get("attention_mask")
        mask = (np.asarray(mask)[:, :max_len] if mask is not None
                else (ids != 0).astype(np.int32))
        if mask.shape[1] < max_len:
            mask = np.pad(mask, ((0, 0), (0, max_len - mask.shape[1])))
        out = encoder(jnp.asarray(ids))
        states = out[0] if isinstance(out, tuple) else out
        return states, jnp.asarray(mask, jnp.int32)

    def encode_prompt(self, prompt):
        cfg = self.transformer.config
        clip_states, clip_mask = self._encode(
            self.tokenizer, self.text_encoder, prompt, cfg.text_len)
        t5_states, t5_mask = self._encode(
            self.tokenizer_t5, self.text_encoder_t5, prompt, cfg.text_len_t5)
        return clip_states, clip_mask, t5_states, t5_mask

    def __call__(self, prompt: Union[str, List[str]], negative_prompt=None,
                 height: Optional[int] = None, width: Optional[int] = None,
                 num_inference_steps: int = 25, guidance_scale: float = 5.0,
                 seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        do_cfg = guidance_scale > 1.0

        cond = self.encode_prompt(prompt)
        if do_cfg:
            neg = self.encode_prompt(negative_prompt)
            ctx = tuple(jnp.concatenate([n, c]) for n, c in zip(neg, cond))
        else:
            ctx = cond

        tf = self.transformer
        size = tf.config.sample_size
        height = height or size * self.vae_scale_factor
        width = width or size * self.vae_scale_factor
        b = len(prompt)
        shape = (b, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, tf.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        from .pipeline_utils import make_scheduler_state
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        scheduler = self.scheduler
        lat_ch = tf.config.in_channels

        def build():
            def denoise(params, latents, ctx, state, gs):
                clip_s, clip_m, t5_s, t5_m = ctx

                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = (jnp.concatenate([latents, latents])
                              if do_cfg else latents)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = tf.module.apply(
                        {"params": params}, lat_in.astype(tf.dtype), t_in,
                        clip_s.astype(tf.dtype), clip_m,
                        t5_s.astype(tf.dtype), t5_m).astype(jnp.float32)
                    pred = pred[..., :lat_ch]  # drop the learned variance
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(
            ("hunyuan", shape, num_inference_steps, do_cfg), build)(
            tf.params, latents, ctx, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self.vae.decode((latents / self.vae.config.scaling_factor
                                 ).astype(self.vae.dtype)).astype(jnp.float32)
        return (self.image_processor.postprocess(np.asarray(image),
                                                 output_type),)
