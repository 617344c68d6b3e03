"""Stable Diffusion long-tail pipelines (reference
ppdiffusers/pipelines/stable_diffusion/ remaining variants):

- StableDiffusionPanoramaPipeline   (pipeline_stable_diffusion_panorama.py —
  MultiDiffusion sliding windows; here all views batch through ONE UNet call
  per step instead of the reference's python per-view loop)
- StableDiffusionSAGPipeline        (pipeline_stable_diffusion_sag.py —
  self-attention-guidance via the mid-block attn map sown under
  mutable=["intermediates"]; the reference swaps attention processors)
- StableDiffusionDepth2ImgPipeline  (pipeline_stable_diffusion_depth2img.py —
  SD2-depth: the depth map rides an extra latent channel)
- StableDiffusionLDM3DPipeline      (pipeline_stable_diffusion_ldm3d.py —
  joint RGB+depth generation through a 6-channel VAE)
- StableDiffusionModelEditingPipeline (pipeline_stable_diffusion_model_editing.py
  — TIME: closed-form ridge edit of the cross-attn K/V projections)
- StableDiffusionParadigmsPipeline  (pipeline_stable_diffusion_paradigms.py —
  parallel-in-time Picard sampling; the trajectory updates in batched UNet
  sweeps, a natural TPU fit)

Everything keeps the house idiom: one jitted lax.fori_loop denoise, CFG on the
batch axis, static shapes."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionPipeline, _JitCache


def _views(size_h, size_w, window, stride):
    """Static sliding-window origins covering a (size_h, size_w) canvas."""
    def axis(size, win):
        if size <= win:
            return [0], win
        xs = list(range(0, size - win + 1, stride))
        if xs[-1] != size - win:
            xs.append(size - win)
        return xs, win

    hs, win_h = axis(size_h, min(window, size_h))
    ws, win_w = axis(size_w, min(window, size_w))
    return [(h, w) for h in hs for w in ws], win_h, win_w


def gaussian_blur_2d(x, kernel_size: int = 9, sigma: float = 1.0):
    """Separable gaussian blur over NHWC (reference pipeline_stable_diffusion_sag.py
    gaussian_blur_2d), SAME padding."""
    half = (kernel_size - 1) / 2
    grid = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k1 = jnp.exp(-0.5 * (grid / sigma) ** 2)
    k1 = k1 / k1.sum()
    c = x.shape[-1]
    kh = jnp.tile(k1.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    pad = (kernel_size - 1) // 2
    x = jax.lax.conv_general_dilated(x, kh.astype(x.dtype), (1, 1),
                                     [(pad, pad), (0, 0)], dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw.astype(x.dtype), (1, 1),
                                     [(0, 0), (pad, pad)], dimension_numbers=dn,
                                     feature_group_count=c)
    return x


@register_pipeline
class StableDiffusionPanoramaPipeline(StableDiffusionPipeline):
    """MultiDiffusion panorama (reference pipeline_stable_diffusion_panorama.py):
    overlapping latent windows are denoised and fused by averaging.

    TPU-native shape: the reference steps each view separately in python and
    averages the *stepped latents*; here every view's noise prediction is one
    batched UNet call and the per-pixel average of epsilon feeds ONE
    scheduler.step on the full canvas — identical for schedulers whose step is
    affine in (sample, model_output) at fixed t (DDIM/Euler/DPM deterministic
    modes), and loop-free. Circular padding (360°) is out of scope."""

    def __call__(  # type: ignore[override]
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 512,
        width: int = 2048,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        view_window: int = 64,
        view_stride: int = 8,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        lat_h = height // self.vae_scale_factor
        lat_w = width // self.vae_scale_factor
        views, win_h, win_w = _views(lat_h, lat_w, view_window, view_stride)
        nv = len(views)
        # context tiled per view (CFG halves stay contiguous for jnp.split)
        ctx = jnp.repeat(cond, nv, axis=0)
        ctx_u = jnp.repeat(uncond, nv, axis=0)
        context = jnp.concatenate([ctx_u, ctx]) if do_cfg else ctx

        lat_ch = self.unet.config.in_channels
        shape = (batch, lat_h, lat_w, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        unet, scheduler = self.unet, self.scheduler
        counts = jnp.zeros((1, lat_h, lat_w, 1), jnp.float32)
        for (h0, w0) in views:
            counts = counts.at[:, h0:h0 + win_h, w0:w0 + win_w, :].add(1.0)

        def build():
            def denoise(params, latents, context, state, gs, counts):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    scaled = scheduler.scale_model_input(state, latents, i)
                    tiles = jnp.concatenate(
                        [scaled[:, h0:h0 + win_h, w0:w0 + win_w, :]
                         for (h0, w0) in views])          # (nv*b, wh, ww, c)
                    lat_in = jnp.concatenate([tiles, tiles]) if do_cfg else tiles
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    # scatter-average epsilon back onto the canvas
                    eps = jnp.zeros_like(latents)
                    for k, (h0, w0) in enumerate(views):
                        eps = eps.at[:, h0:h0 + win_h, w0:w0 + win_w, :].add(
                            pred[k * batch:(k + 1) * batch])
                    eps = eps / counts
                    latents, state = scheduler.step(state, eps, i, latents)
                    return latents, state

                latents, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                               (latents, state))
                return latents

            return jax.jit(denoise)

        denoise = self._jit.get(("pano", shape, nv, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, state,
                          jnp.asarray(guidance_scale, jnp.float32), counts)
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class StableDiffusionSAGPipeline(StableDiffusionPipeline):
    """Self-attention guidance (reference pipeline_stable_diffusion_sag.py):
    blur the predicted x0 where the mid-block self-attention concentrates,
    renoise, and push the prediction away from the degraded branch.

    The attention map comes from the UNet mid-block's attn1, sown under
    mutable=["intermediates"] (models/attention.py capture_self) — the
    reference swaps in a map-storing attention processor instead. Epsilon
    prediction + an alphas_cumprod scheduler (DDIM/DDPM family) required."""

    def __call__(  # type: ignore[override]
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        sag_scale: float = 0.75,
        negative_prompt=None,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        if getattr(self.scheduler, "alphas_cumprod", None) is None:
            raise ValueError("SAG needs an alphas_cumprod scheduler (DDIM/DDPM family)")
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        uncond_ctx = uncond if do_cfg else cond

        lat_ch = self.unet.config.in_channels
        lat_h = height // self.vae_scale_factor
        lat_w = width // self.vae_scale_factor
        shape = (batch, lat_h, lat_w, lat_ch)
        # mid-block spatial size (one downsample per extra level)
        ds = 2 ** (len(self.unet.config.block_out_channels) - 1)
        map_h, map_w = lat_h // ds, lat_w // ds
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        acp = jnp.asarray(self.scheduler.alphas_cumprod, jnp.float32)

        unet, scheduler = self.unet, self.scheduler

        def _mid_self_map(inter):
            maps = [l for path, l in jax.tree_util.tree_flatten_with_path(inter)[0]
                    if any("self_attn_probs" in str(getattr(k, "key", k)) for k in path)
                    and hasattr(l, "ndim") and l.ndim == 3
                    and l.shape[1] == map_h * map_w]
            return sum(maps) / len(maps)  # (B, hw, hw) head-averaged

        def build():
            def denoise(params, latents, context, uncond_ctx, state, gs, sag):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred, mut = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype), mutable=["intermediates"])
                    pred = pred.astype(jnp.float32)
                    attn = _mid_self_map(mut["intermediates"])
                    if do_cfg:
                        eps_u, eps_c = jnp.split(pred, 2)
                        eps_cfg = eps_u + gs * (eps_c - eps_u)
                        attn = jnp.split(attn, 2)[0]  # uncond branch, ref behavior
                    else:
                        eps_u = eps_cfg = pred
                    a_t = acp[t.astype(jnp.int32)]
                    sqrt_a, sqrt_1ma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
                    x0 = (latents - sqrt_1ma * eps_u) / sqrt_a
                    # mask: keys receiving above-average total attention
                    mask = (attn.sum(axis=1) > 1.0).astype(jnp.float32)
                    mask = mask.reshape(batch, map_h, map_w, 1)
                    mask = jax.image.resize(mask, (batch, lat_h, lat_w, 1), "nearest")
                    degraded = gaussian_blur_2d(x0) * mask + x0 * (1.0 - mask)
                    degraded_lat = sqrt_a * degraded + sqrt_1ma * eps_u
                    t_in1 = jnp.broadcast_to(t, (batch,))
                    degraded_in = scheduler.scale_model_input(state, degraded_lat, i)
                    eps_deg = unet.module.apply(
                        {"params": params}, degraded_in.astype(unet.dtype),
                        t_in1, uncond_ctx.astype(unet.dtype)).astype(jnp.float32)
                    eps_final = eps_cfg + sag * (eps_u - eps_deg)
                    latents, state = scheduler.step(state, eps_final, i, latents)
                    return latents, state

                latents, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                               (latents, state))
                return latents

            return jax.jit(denoise)

        denoise = self._jit.get(("sag", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, uncond_ctx, state,
                          jnp.asarray(guidance_scale, jnp.float32),
                          jnp.asarray(sag_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class StableDiffusionDepth2ImgPipeline(StableDiffusionPipeline):
    """SD2-depth image-to-image (reference pipeline_stable_diffusion_depth2img.py):
    a per-image min/max-normalized depth map rides the 5th UNet input channel.
    Pass depth_map (H, W) or (B, H, W); the reference's DPT estimator is an
    external torch model — a `depth_estimator` callable (image -> depth) may be
    supplied at construction instead."""

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 depth_estimator=None, feature_extractor=None):
        super().__init__(vae, text_encoder, tokenizer, unet, scheduler,
                         feature_extractor=feature_extractor)
        self.depth_estimator = depth_estimator

    def __call__(  # type: ignore[override]
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        depth_map=None,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        batch = cond.shape[0]

        init = jnp.asarray(self.image_processor.preprocess(image))
        if init.shape[0] != batch:
            init = jnp.broadcast_to(init, (batch, *init.shape[1:]))
        posterior = self.vae.encode(init.astype(self.vae.dtype))
        latents0 = posterior.sample(jax.random.PRNGKey(seed + 1)).astype(jnp.float32)
        latents0 = latents0 * self.vae.config.scaling_factor
        lat_h, lat_w = latents0.shape[1:3]

        if depth_map is None:
            if self.depth_estimator is None:
                raise ValueError("pass depth_map or construct with a depth_estimator")
            depth_map = self.depth_estimator(image)
        depth = jnp.asarray(np.asarray(depth_map, np.float32))
        if depth.ndim == 2:
            depth = depth[None]
        depth = jax.image.resize(depth[..., None], (depth.shape[0], lat_h, lat_w, 1),
                                 "bilinear")
        dmin = depth.min(axis=(1, 2, 3), keepdims=True)
        dmax = depth.max(axis=(1, 2, 3), keepdims=True)
        depth = 2.0 * (depth - dmin) / jnp.maximum(dmax - dmin, 1e-6) - 1.0
        depth = jnp.broadcast_to(depth, (batch, lat_h, lat_w, 1))

        state = self.scheduler.set_timesteps(num_inference_steps)
        t_start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        noise = jax.random.normal(jax.random.PRNGKey(seed), latents0.shape, jnp.float32)
        t0 = state.timesteps[t_start].astype(jnp.int32)
        if hasattr(state, "sigmas"):
            latents = latents0 + state.sigmas[t_start] * noise
        else:
            latents = self.scheduler.add_noise(latents0, noise, t0[None])

        unet, scheduler = self.unet, self.scheduler
        shape = latents.shape

        def build():
            def denoise(params, latents, depth, context, state, gs):
                depth_in = jnp.concatenate([depth, depth]) if do_cfg else depth

                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    lat_in = jnp.concatenate([lat_in, depth_in], axis=-1)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                latents, _ = jax.lax.fori_loop(t_start, num_inference_steps, body,
                                               (latents, state))
                return latents

            return jax.jit(denoise)

        denoise = self._jit.get(("d2i", shape, num_inference_steps, t_start, do_cfg),
                                build)
        latents = denoise(self.unet.params, latents, depth, context, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)


@register_pipeline
class StableDiffusionLDM3DPipeline(StableDiffusionPipeline):
    """LDM3D joint RGB+depth (reference pipeline_stable_diffusion_ldm3d.py):
    the VAE carries 6 image channels (RGB + 3-channel packed depth); the
    denoise loop is stock SD. Returns (rgb, depth): rgb postprocessed like any
    SD output, depth as the raw float array in [0, 1] (the reference packs it
    to uint16 for PIL — a host-side format choice)."""

    def __call__(self, *args, output_type: str = "np", **kwargs):  # type: ignore[override]
        latents = super().__call__(*args, output_type="latent", **kwargs)[0]
        decoded = self._decode_latents(latents)  # (B, H, W, 6)
        rgb, depth = decoded[..., :3], decoded[..., 3:]
        rgb_out = self.image_processor.postprocess(rgb, output_type)
        depth01 = np.asarray(jnp.clip(depth / 2 + 0.5, 0.0, 1.0))
        return (rgb_out, depth01)


# TIME prompt augmentations (reference pipeline_stable_diffusion_model_editing.py
# AUGS_CONST — templated contexts so the edit generalizes beyond one phrasing)
TIME_AUGS = ["{}", "A photo of {}", "An image of {}", "A picture of {}",
             "A painting of {}", "A rendering of {}", "A cropped photo of {}",
             "A close-up photo of {}", "A bright photo of {}", "A dark photo of {}"]


@register_pipeline
class StableDiffusionModelEditingPipeline(StableDiffusionPipeline):
    """TIME model editing (reference pipeline_stable_diffusion_model_editing.py):
    edit_model() rewrites every cross-attention K/V projection in closed form
    so `source_prompt` maps to the value space of `destination_prompt`:

        W' = (lambda W + (W E_new^T)^T? ...) — concretely
        W' = (lambda W + V^T E_old) (lambda I + E_old^T E_old)^{-1}

    with E_old/E_new the token embeddings of the augmented prompt pairs and
    V = E_new W^T the destination values. Pure pytree math — no optimizer."""

    _EDIT_KEYS = ("to_k", "to_v")

    def edit_model(self, source_prompt: str, destination_prompt: str,
                   lamb: float = 0.1):
        from flax.traverse_util import flatten_dict, unflatten_dict

        texts_old = [a.format(source_prompt) for a in TIME_AUGS]
        texts_new = [a.format(destination_prompt) for a in TIME_AUGS]
        ids_old = jnp.asarray(self.tokenizer(texts_old)["input_ids"])
        ids_new = jnp.asarray(self.tokenizer(texts_new)["input_ids"])
        e_old = self.text_encoder(ids_old)[0].astype(jnp.float32)
        e_new = self.text_encoder(ids_new)[0].astype(jnp.float32)
        d = e_old.shape[-1]
        e_old = e_old.reshape(-1, d)  # (N, d_ctx)
        e_new = e_new.reshape(-1, d)

        mat2 = lamb * jnp.eye(d, dtype=jnp.float32) + e_old.T @ e_old
        mat2_inv = jnp.linalg.inv(mat2)

        params = dict(self.unet.params)
        flat = flatten_dict(params)
        n_edited = 0
        for key, leaf in list(flat.items()):
            path = tuple(str(k) for k in key)
            if ("attn2" in path and path[-1] == "kernel"
                    and path[-2] in self._EDIT_KEYS
                    and leaf.ndim == 2 and leaf.shape[0] == d):
                w = leaf.astype(jnp.float32).T            # (d_out, d_ctx)
                values = e_new @ w.T                       # (N, d_out)
                mat1 = lamb * w + values.T @ e_old         # (d_out, d_ctx)
                flat[key] = (mat1 @ mat2_inv).T.astype(leaf.dtype)
                n_edited += 1
        if n_edited == 0:
            raise ValueError("no cross-attention projections found to edit")
        self.unet.params = unflatten_dict(flat)
        self._jit = _JitCache()  # params identity changed; drop stale closures
        return n_edited


@register_pipeline
class StableDiffusionParadigmsPipeline(StableDiffusionPipeline):
    """Parallel-in-time (Picard/ParaDiGMS) sampling (reference
    pipeline_stable_diffusion_paradigms.py + parallel DDIM/DDPM schedulers):
    the whole trajectory x_T..x_0 updates in batched UNet sweeps —

        sweep:  x_{i+1} <- step(x_i, eps(x_i, t_i))   for ALL i at once

    a Jacobi iteration over a triangular system, so `num_sweeps ==
    num_inference_steps` reproduces sequential sampling EXACTLY (each sweep
    finalizes at least one more step) and fewer sweeps trade exactness for
    wall-clock where batch FLOPs are cheap — the TPU-native framing of the
    reference's tolerance-windowed python loop. Deterministic (ODE) scheduler
    steps required (DDIM eta=0 / Euler). Memory scales with
    num_inference_steps x batch; use small step counts per sweep budget."""

    def __call__(  # type: ignore[override]
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 25,
        num_sweeps: Optional[int] = None,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        T = num_inference_steps
        K = num_sweeps or T
        ctx = jnp.concatenate([jnp.tile(uncond, (T, 1, 1)),
                               jnp.tile(cond, (T, 1, 1))]) if do_cfg \
            else jnp.tile(cond, (T, 1, 1))

        lat_ch = self.unet.config.in_channels
        lat_h = height // self.vae_scale_factor
        lat_w = width // self.vae_scale_factor
        shape = (batch, lat_h, lat_w, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, T, sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, gs):
                traj0 = jnp.broadcast_to(latents[None], (T + 1, *latents.shape))
                idx = jnp.arange(T)

                def sweep(_, traj):
                    xs = traj[:T]                                  # (T, b, h, w, c)
                    scaled = jax.vmap(
                        lambda x, i: scheduler.scale_model_input(state, x, i)
                    )(xs, idx)
                    flat = scaled.reshape(T * batch, lat_h, lat_w, lat_ch)
                    lat_in = jnp.concatenate([flat, flat]) if do_cfg else flat
                    t_in = jnp.repeat(state.timesteps[:T], batch)
                    t_in = jnp.concatenate([t_in, t_in]) if do_cfg else t_in
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    eps = pred.reshape(T, batch, lat_h, lat_w, lat_ch)
                    stepped = jax.vmap(
                        lambda e, x, i: scheduler.step(state, e, i, x)[0]
                    )(eps, xs, idx)
                    return jnp.concatenate([traj[:1], stepped])

                traj = jax.lax.fori_loop(0, K, sweep, traj0)
                return traj[T]

            return jax.jit(denoise)

        denoise = self._jit.get(("paradigms", shape, T, K, do_cfg), build)
        latents = denoise(self.unet.params, latents, ctx, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


class StableUnCLIPImageNormalizer:
    """CLIP-image-embedding normalizer (reference
    stable_diffusion/stable_unclip_image_normalizer.py): learned mean/std of
    the embedding distribution, used to whiten before noising and un-whiten
    after. Plain arrays — load from the checkpoint's safetensors or pass
    directly."""

    def __init__(self, mean=None, std=None):
        # scalar identity defaults broadcast over any embedding width
        self.mean = jnp.asarray(0.0 if mean is None else mean,
                                jnp.float32).reshape(1, -1) if mean is not None \
            else jnp.zeros((1, 1), jnp.float32)
        self.std = jnp.asarray(std, jnp.float32).reshape(1, -1) \
            if std is not None else jnp.ones((1, 1), jnp.float32)

    def scale(self, x):
        return (x - self.mean) / self.std

    def unscale(self, x):
        return x * self.std + self.mean


@register_pipeline
class StableUnCLIPImg2ImgPipeline(StableDiffusionPipeline):
    """Stable unCLIP image variations (reference
    pipeline_stable_unclip_img2img.py): the CLIP image embedding of the input —
    whitened, noised to `noise_level` by a DDPM schedule, un-whitened, and
    concatenated with a sinusoidal embedding of the noise level — conditions
    the SD2.1-unclip UNet through class_embed_type="projection". Text drives
    cross-attention as usual. The text-to-image StableUnCLIP variant is the
    same decoder fed by a Karlo prior (pipelines/unclip.py UnCLIPPipeline
    prior stage) instead of a real image's embedding."""

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 image_encoder=None, image_normalizer=None,
                 image_noising_scheduler=None, feature_extractor=None):
        super().__init__(vae, text_encoder, tokenizer, unet, scheduler,
                         feature_extractor=feature_extractor)
        self.image_encoder = image_encoder
        self.image_normalizer = image_normalizer or StableUnCLIPImageNormalizer()
        self.image_noising_scheduler = image_noising_scheduler

    def noise_image_embeddings(self, embeds, noise_level: int, seed: int = 0):
        from ..models.embeddings import get_timestep_embedding

        emb = self.image_normalizer.scale(embeds.astype(jnp.float32))
        t = jnp.full((emb.shape[0],), noise_level, jnp.int32)
        noise = jax.random.normal(jax.random.PRNGKey(seed + 7), emb.shape, jnp.float32)
        emb = self.image_noising_scheduler.add_noise(emb, noise, t)
        emb = self.image_normalizer.unscale(emb)
        nl = get_timestep_embedding(t, emb.shape[-1], flip_sin_to_cos=True,
                                    downscale_freq_shift=0.0)
        return jnp.concatenate([emb, nl], axis=-1)

    def __call__(  # type: ignore[override]
        self,
        image=None,
        prompt: Union[str, List[str]] = "",
        height: int = 768,
        width: int = 768,
        num_inference_steps: int = 20,
        guidance_scale: float = 10.0,
        negative_prompt=None,
        noise_level: int = 0,
        image_embeds: Optional[jnp.ndarray] = None,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        return_dict: bool = False,
    ):
        from .sd_variants import _to_px

        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        if image_embeds is None:
            image_embeds = self.image_encoder.encode_image(_to_px(image))
        class_cond = self.noise_image_embeddings(image_embeds, noise_level, seed)
        if class_cond.shape[0] != batch:
            class_cond = jnp.broadcast_to(class_cond, (batch, class_cond.shape[-1]))
        class_labels = (jnp.concatenate([jnp.zeros_like(class_cond), class_cond])
                        if do_cfg else class_cond)

        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, lat_ch)
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, class_labels, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        class_labels=class_labels.astype(unet.dtype),
                    ).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                latents, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                               (latents, state))
                return latents

            return jax.jit(denoise)

        denoise = self._jit.get(("sunclip", shape, num_inference_steps, do_cfg), build)
        latents = denoise(self.unet.params, latents, context, class_labels, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
