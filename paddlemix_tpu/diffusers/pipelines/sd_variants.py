"""Stable Diffusion task variants.

Rebuilds of the reference's stable_diffusion family tail:
pipeline_stable_diffusion_instruct_pix2pix.py (dual image+text guidance),
pipeline_stable_diffusion_image_variation.py (CLIP-image conditioned),
pipeline_stable_diffusion_upscale.py (x4 latent upscaler with noise-level
conditioning), pipeline_cycle_diffusion.py (DDIM-inversion based editing).
Each loop is one jitted fori_loop."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionPipeline, _JitCache


def _to_px(image):
    img = jnp.asarray(np.asarray(image, np.float32))
    if img.max() > 1.5:
        img = img / 127.5 - 1.0
    if img.ndim == 3:
        img = img[None]
    return img


@register_pipeline
class StableDiffusionInstructPix2PixPipeline(StableDiffusionPipeline):
    """InstructPix2Pix: edit an image by instruction with SEPARATE text and
    image guidance scales (reference
    pipeline_stable_diffusion_instruct_pix2pix.py): three UNet rows
    [cond, image-only, uncond]; the 8-channel UNet concatenates the original
    image latents every step."""

    def __call__(self, prompt, image=None, num_inference_steps: int = 50,
                 guidance_scale: float = 7.5, image_guidance_scale: float = 1.5,
                 negative_prompt=None, seed: int = 0, output_type: str = "np"):
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        b = cond.shape[0]
        # rows: [text+image, image-only, neither] (reference ordering)
        context = jnp.concatenate([cond, uncond, uncond])

        px = _to_px(image)
        img_lat = self.vae.encode(px.astype(self.vae.dtype)).mode().astype(jnp.float32)
        # NOTE reference quirk: pix2pix image latents are NOT scaled
        zeros = jnp.zeros_like(img_lat)
        image_rows = jnp.concatenate([img_lat, img_lat, zeros])

        h, w = img_lat.shape[1:3]
        lat_ch = self.unet.config.in_channels - img_lat.shape[-1]
        shape = (b, h, w, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, image_rows, context, state, gs, igs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents] * 3)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    lat_in = jnp.concatenate([lat_in, image_rows], axis=-1)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    p_txt, p_img, p_un = jnp.split(pred, 3)
                    pred = p_un + gs * (p_txt - p_img) + igs * (p_img - p_un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("p2p", shape, num_inference_steps), build)(
            self.unet.params, latents, image_rows, context, state,
            jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(image_guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)


@register_pipeline
class StableDiffusionImageVariationPipeline(DiffusionPipeline):
    """Image variations: the condition is the CLIP image embedding of the
    input (reference pipeline_stable_diffusion_image_variation.py)."""

    def __init__(self, vae, image_encoder, unet, scheduler,
                 feature_extractor=None, safety_checker=None):
        self.register_modules(vae=vae, image_encoder=image_encoder, unet=unet,
                              scheduler=scheduler,
                              feature_extractor=feature_extractor)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def __call__(self, image, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 seed: int = 0, output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        px = _to_px(image)
        ctx = self.image_encoder.encode_image(px)[:, None, :]
        context = jnp.concatenate([jnp.zeros_like(ctx), ctx]) if do_cfg else ctx
        b = ctx.shape[0]
        shape = (b, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
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

        latents = self._jit.get(("imvar", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        return (np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1)),)


@register_pipeline
class StableDiffusionUpscalePipeline(DiffusionPipeline):
    """x4 upscaler (reference pipeline_stable_diffusion_upscale.py): the
    low-res image concatenates to the latent channels; a noise level is
    added to the image rows and fed as class conditioning."""

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 low_res_scheduler=None, max_noise_level: int = 350):
        self.register_modules(vae=vae, text_encoder=text_encoder,
                              tokenizer=tokenizer, unet=unet,
                              scheduler=scheduler,
                              low_res_scheduler=low_res_scheduler or scheduler)
        self.max_noise_level = max_noise_level
        self._jit = _JitCache()

    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        cond = self.text_encoder(jnp.asarray(self.tokenizer(prompt)["input_ids"]))[0]
        uncond = self.text_encoder(jnp.asarray(
            self.tokenizer(negative_prompt)["input_ids"]))[0]
        return cond, uncond

    def __call__(self, prompt, image=None, num_inference_steps: int = 50,
                 guidance_scale: float = 9.0, noise_level: int = 20,
                 negative_prompt=None, seed: int = 0, output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        px = _to_px(image)
        b, h, w, c = px.shape
        key = jax.random.PRNGKey(seed)
        key, k_img, k_lat = jax.random.split(key, 3)
        # noise the low-res image to noise_level (reference low_res_scheduler)
        nl = jnp.asarray([noise_level] * b, jnp.int32)
        noise = jax.random.normal(k_img, px.shape, jnp.float32)
        px_noised = self.low_res_scheduler.add_noise(px, noise, nl)
        image_rows = jnp.concatenate([px_noised, px_noised]) if do_cfg else px_noised
        class_rows = jnp.concatenate([nl, nl]) if do_cfg else nl

        lat_ch = self.unet.config.in_channels - c
        shape = (b, h, w, lat_ch)
        latents = jax.random.normal(k_lat, shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, image_rows, class_rows, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    lat_in = jnp.concatenate([lat_in, image_rows], axis=-1)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        class_labels=class_rows).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("upscale", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, image_rows, class_rows, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        return (np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1)),)


@register_pipeline
class CycleDiffusionPipeline(StableDiffusionPipeline):
    """Cycle Diffusion source->target editing (reference
    pipeline_cycle_diffusion.py): DPM-encoded source noise is reused while
    denoising under the target prompt; implemented over DDIM inversion —
    invert the source image with the source prompt, then denoise with the
    target prompt."""

    def __call__(self, prompt=None, source_prompt=None, image=None,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 seed: int = 0, output_type: str = "np"):
        from ..schedulers import DDIMInverseScheduler

        px = _to_px(image)
        src_lat = self.vae.encode(px.astype(self.vae.dtype)).mode()
        src_lat = src_lat.astype(jnp.float32) * self.vae.config.scaling_factor

        src_cond, _ = self.encode_prompt(source_prompt or prompt)
        inverse = DDIMInverseScheduler(
            num_train_timesteps=self.scheduler.config.num_train_timesteps,
            beta_schedule=self.scheduler.config.beta_schedule,
            beta_start=self.scheduler.config.beta_start,
            beta_end=self.scheduler.config.beta_end, clip_sample=False)
        inv_state = inverse.set_timesteps(num_inference_steps)
        unet = self.unet

        def build_inv():
            def invert(params, lat, ctx, state):
                def body(i, carry):
                    lat, state = carry
                    t = state.timesteps[i]
                    t_in = jnp.broadcast_to(t, (lat.shape[0],))
                    eps = unet.module.apply({"params": params},
                                            lat.astype(unet.dtype), t_in,
                                            ctx.astype(unet.dtype)).astype(jnp.float32)
                    lat, state = inverse.step(state, eps, i, lat)
                    return lat, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (lat, state))
                return out

            return jax.jit(invert)

        noisy = self._jit.get(("cycle_inv", src_lat.shape, num_inference_steps),
                              build_inv)(
            self.unet.params, src_lat, src_cond, inv_state)

        # denoise under the target prompt from the inverted noise
        h_lat, w_lat = noisy.shape[1:3]
        return super().__call__(prompt, height=h_lat * self.vae_scale_factor,
                                width=w_lat * self.vae_scale_factor,
                                num_inference_steps=num_inference_steps,
                                guidance_scale=guidance_scale, seed=seed,
                                latents=noisy, output_type=output_type)


@register_pipeline
class StableDiffusionDiffEditPipeline(StableDiffusionPipeline):
    """DiffEdit (reference pipeline_stable_diffusion_diffedit.py): the edit
    mask is DISCOVERED by contrasting noise predictions under the source vs
    target prompts (:818 generate_mask); the source image is DDIM-inverted
    and re-denoised under the target prompt with the unmasked region pinned
    to the inversion trajectory each step."""

    def generate_mask(self, image, source_prompt, target_prompt,
                      num_maps: int = 10, mask_encode_strength: float = 0.5,
                      mask_thresholding_ratio: float = 3.0, seed: int = 0):
        px = _to_px(image)
        lat = self.vae.encode(px.astype(self.vae.dtype)).mode()
        lat = lat.astype(jnp.float32) * self.vae.config.scaling_factor
        src, _ = self.encode_prompt(source_prompt)
        tgt, _ = self.encode_prompt(target_prompt)
        n_train = self.scheduler.config.num_train_timesteps
        t = jnp.asarray(int(n_train * mask_encode_strength), jnp.int32)
        key = jax.random.PRNGKey(seed)
        unet = self.unet

        @jax.jit
        def diffs(params, lat, src, tgt, key):
            def one(key):
                noise = jax.random.normal(key, lat.shape, jnp.float32)
                noisy = self.scheduler.add_noise(lat, noise,
                                                 jnp.broadcast_to(t, (lat.shape[0],)))
                both = jnp.concatenate([noisy, noisy])
                ctx = jnp.concatenate([src, tgt])
                t_in = jnp.broadcast_to(t, (both.shape[0],))
                eps = unet.module.apply({"params": params},
                                        both.astype(unet.dtype), t_in,
                                        ctx.astype(unet.dtype)).astype(jnp.float32)
                e_src, e_tgt = jnp.split(eps, 2)
                return jnp.abs(e_src - e_tgt).mean(axis=-1)  # (B, h, w)

            keys = jax.random.split(key, num_maps)
            return jax.vmap(one)(keys).mean(axis=0)

        d = diffs(unet.params, lat, src, tgt, key)
        d = d / jnp.clip(d.mean(axis=(1, 2), keepdims=True), 1e-8)
        mask = (d > (d.mean(axis=(1, 2), keepdims=True) *
                     mask_thresholding_ratio / 2)).astype(jnp.float32)
        return mask  # (B, h, w) 1 = edit here

    def invert(self, image, prompt, num_inference_steps: int = 50):
        """DDIM-invert the image under ``prompt``; returns the trajectory
        (steps+1, B, h, w, C) from clean to noisy."""
        from ..schedulers import DDIMInverseScheduler

        px = _to_px(image)
        lat = self.vae.encode(px.astype(self.vae.dtype)).mode()
        lat = lat.astype(jnp.float32) * self.vae.config.scaling_factor
        ctx, _ = self.encode_prompt(prompt)
        inverse = DDIMInverseScheduler(
            num_train_timesteps=self.scheduler.config.num_train_timesteps,
            beta_schedule=self.scheduler.config.beta_schedule,
            beta_start=self.scheduler.config.beta_start,
            beta_end=self.scheduler.config.beta_end, clip_sample=False)
        state = inverse.set_timesteps(num_inference_steps)
        unet = self.unet

        @jax.jit
        def run(params, lat, ctx):
            def body(i, carry):
                lat, traj = carry
                t = state.timesteps[i]
                t_in = jnp.broadcast_to(t, (lat.shape[0],))
                eps = unet.module.apply({"params": params},
                                        lat.astype(unet.dtype), t_in,
                                        ctx.astype(unet.dtype)).astype(jnp.float32)
                lat, _ = inverse.step(state, eps, i, lat)
                traj = traj.at[i + 1].set(lat)
                return lat, traj

            traj0 = jnp.zeros((num_inference_steps + 1, *lat.shape), jnp.float32)
            traj0 = traj0.at[0].set(lat)
            _, traj = jax.lax.fori_loop(0, num_inference_steps, body,
                                        (lat, traj0))
            return traj

        return run(unet.params, lat, ctx)

    def __call__(self, prompt=None, mask_image=None, image_latents=None,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0, output_type: str = "np"):
        """mask_image: (B, h, w) edit mask from generate_mask; image_latents:
        the inversion trajectory from invert()."""
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        traj = image_latents
        latents = traj[-1]
        mask = mask_image[..., None].astype(jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=latents.shape)
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, traj, mask, context, state, gs):
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
                    # pin the unmasked region to the inversion trajectory at
                    # the matching (descending) noise level
                    pinned = traj[num_inference_steps - 1 - i]
                    latents = mask * latents + (1.0 - mask) * pinned
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("diffedit", latents.shape,
                                 num_inference_steps, do_cfg), build)(
            self.unet.params, latents, traj, mask, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)


class PositionNet(nn.Module):
    """GLIGEN grounding-token encoder (reference
    modeling_gligen PositionNet): Fourier box embedding + phrase embedding
    through an MLP; null embeddings fill missing objects."""

    out_dim: int
    fourier_freqs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes, phrase_embeds, masks):
        """boxes (B, M, 4) in [0,1]; phrase_embeds (B, M, D); masks (B, M)."""
        freqs = 2.0 ** jnp.arange(self.fourier_freqs, dtype=jnp.float32)
        ang = boxes[..., None] * freqs * jnp.pi  # (B, M, 4, F)
        xyxy = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        xyxy = xyxy.reshape(*boxes.shape[:2], -1)  # (B, M, 8F)
        null_pos = self.param("null_position_feature",
                              nn.initializers.zeros, (xyxy.shape[-1],))
        null_txt = self.param("null_text_feature", nn.initializers.zeros,
                              (phrase_embeds.shape[-1],))
        m = masks[..., None].astype(xyxy.dtype)
        xyxy = m * xyxy + (1 - m) * null_pos
        txt = m * phrase_embeds + (1 - m) * null_txt
        h = jnp.concatenate([txt, xyxy], axis=-1)
        h = nn.Dense(512, dtype=self.dtype, name="linears_0")(h)
        h = nn.silu(h)
        h = nn.Dense(512, dtype=self.dtype, name="linears_1")(h)
        h = nn.silu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linears_2")(h)


@register_pipeline
class StableDiffusionGLIGENPipeline(StableDiffusionPipeline):
    """GLIGEN grounded text-to-image (reference
    pipeline_stable_diffusion_gligen.py): phrase+box grounding tokens from
    PositionNet enter every transformer block's gated self-attention (UNet
    attention_type='gated'); scheduled sampling zeroes the grounding after
    the first beta fraction of steps."""

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 position_net_params=None, max_objs: int = 30, **kw):
        super().__init__(vae, text_encoder, tokenizer, unet, scheduler, **kw)
        d = unet.config.cross_attention_dim
        self.max_objs = max_objs
        self.position_net = PositionNet(out_dim=d if isinstance(d, int) else d[0])
        if position_net_params is None:
            import jax as _jax

            position_net_params = self.position_net.init(
                _jax.random.PRNGKey(0), jnp.zeros((1, max_objs, 4)),
                jnp.zeros((1, max_objs, self.text_encoder.config.hidden_size)),
                jnp.zeros((1, max_objs)))["params"]
        self.position_net_params = position_net_params

    def _grounding_tokens(self, boxes, phrases, batch):
        m = len(phrases)
        ids = jnp.asarray(self.tokenizer(list(phrases))["input_ids"])
        _, pooled = self.text_encoder(ids)[:2]
        phrase_embeds = jnp.zeros((1, self.max_objs, pooled.shape[-1]))
        phrase_embeds = phrase_embeds.at[0, :m].set(pooled)
        bx = jnp.zeros((1, self.max_objs, 4))
        bx = bx.at[0, :m].set(jnp.asarray(boxes, jnp.float32))
        masks = jnp.zeros((1, self.max_objs)).at[0, :m].set(1.0)
        objs = self.position_net.apply({"params": self.position_net_params},
                                       bx, phrase_embeds, masks)
        return jnp.repeat(objs, batch, axis=0)

    def __call__(self, prompt, gligen_phrases=None, gligen_boxes=None,
                 gligen_scheduled_sampling_beta: float = 0.3,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0, output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        rows = 2 * batch if do_cfg else batch
        objs = self._grounding_tokens(gligen_boxes or [], gligen_phrases or [],
                                      rows)
        n_ground = int(num_inference_steps * gligen_scheduled_sampling_beta)

        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, objs, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    # scheduled sampling: grounding active for the first
                    # beta-fraction of steps, null (zeros) afterwards
                    objs_i = jnp.where(i < n_ground, objs, jnp.zeros_like(objs))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        gligen_objs=objs_i.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("gligen", shape, num_inference_steps, do_cfg,
                                 n_ground), build)(
            self.unet.params, latents, context, objs, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
