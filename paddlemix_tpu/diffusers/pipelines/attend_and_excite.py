"""Attend-and-Excite (reference ppdiffusers/pipelines/stable_diffusion/
pipeline_stable_diffusion_attend_and_excite.py): at the early denoise steps the
latents are nudged by the gradient of an attention-concentration loss so every
requested subject token attains a strong 16x16 cross-attention peak.

TPU-native shape: the reference mutates AttnProcessor objects into the UNet to
record maps (AttentionStore) and runs a python while-loop of backward passes
per step. Here the capture is functional — CrossAttention sows its softmax
probabilities whenever the caller makes the "intermediates" collection mutable
(models/attention.py) — and the whole denoise, including the fixed-count
refinement inner loop and its jax.grad, compiles into ONE lax.fori_loop
program; the alter/no-alter schedule is a lax.cond on the step index."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionPipeline


def _gaussian_kernel(size: int = 3, sigma: float = 0.5):
    ax = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    k = np.outer(g, g)
    return jnp.asarray(k / k.sum())


def _smooth(map2d, kernel):
    """3x3 gaussian smoothing of a (res, res) map (reference GaussianSmoothing)."""
    x = map2d[None, :, :, None]
    k = kernel[:, :, None, None]
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[0, :, :, 0]


@register_pipeline
class StableDiffusionAttendAndExcitePipeline(StableDiffusionPipeline):
    def _attn_maps_at_res(self, inter, res: int):
        """Mean of every sown cross-attention map whose query length is res^2.

        inter: the "intermediates" tree from module.apply; sown leaves are
        (batch, sq, skv) head-averaged probability maps. Filter by the sow
        name so the mid-block's self_attn_probs (SAG hook) never mix in."""
        maps = [l for path, l in jax.tree_util.tree_flatten_with_path(inter)[0]
                if any("cross_attn_probs" in str(getattr(k, "key", k)) for k in path)
                and hasattr(l, "ndim") and l.ndim == 3 and l.shape[1] == res * res]
        if not maps:
            raise ValueError(f"no cross-attention maps at {res}x{res}; "
                             "check attn_res vs the UNet's attention levels")
        return sum(maps) / len(maps)  # (b, res*res, skv)

    def __call__(self, prompt=None, token_indices: Tuple[int, ...] = (1,),
                 height: Optional[int] = None, width: Optional[int] = None,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0,
                 max_iter_to_alter: int = 25, refine_steps: int = 1,
                 scale_factor: float = 20.0, attn_res: Optional[int] = None,
                 output_type: str = "pil", return_dict: bool = False):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        sample = self.unet.config.sample_size
        height = height or sample * self.vae_scale_factor
        width = width or sample * self.vae_scale_factor
        lat_h, lat_w = height // self.vae_scale_factor, width // self.vae_scale_factor
        if attn_res is None:
            attn_res = int(np.ceil(lat_h / 4))  # 16 for the SD 64x64 recipe

        state = make_scheduler_state(
            self.scheduler, num_inference_steps,
            sample_shape=(batch, lat_h, lat_w, 4))
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(key, (batch, lat_h, lat_w, 4), jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma

        unet, scheduler = self.unet, self.scheduler
        indices = tuple(int(i) for i in token_indices)
        kernel = _gaussian_kernel()
        # sqrt-decayed update sizes, reference step-size schedule
        step_sizes = jnp.asarray(
            scale_factor * np.sqrt(np.linspace(1.0, 0.0, num_inference_steps,
                                               endpoint=False)), jnp.float32)
        maps_self = self

        def build():
            def attn_loss(latents, t, state, i):
                """1 - weakest subject-token peak (reference _compute_loss)."""
                lat_in = scheduler.scale_model_input(state, latents, i)
                t_in = jnp.broadcast_to(t, (batch,))
                _, inter = unet.module.apply(
                    {"params": unet.params}, lat_in.astype(unet.dtype), t_in,
                    cond.astype(unet.dtype), mutable=["intermediates"])
                maps = maps_self._attn_maps_at_res(
                    inter["intermediates"], attn_res)[0].astype(jnp.float32)
                text = maps[:, 1:]               # drop BOS (reference :1,-1)
                text = jax.nn.softmax(text * 100.0, axis=-1)
                peaks = []
                for idx in indices:
                    m = text[:, idx - 1].reshape(attn_res, attn_res)
                    peaks.append(jnp.max(_smooth(m, kernel)))
                return 1.0 - jnp.min(jnp.stack(peaks))

            grad_fn = jax.grad(attn_loss, argnums=0)

            def denoise(latents, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]

                    def alter(latents):
                        def refine(_, lat):
                            g = grad_fn(lat, t, state, i)
                            return lat - step_sizes[i] * g
                        return jax.lax.fori_loop(0, refine_steps, refine, latents)

                    latents = jax.lax.cond(i < max_iter_to_alter, alter,
                                           lambda l: l, latents)
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": unet.params}, lat_in.astype(unet.dtype), t_in,
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

        latents = self._jit.get(
            ("attend_excite", latents.shape, num_inference_steps, indices,
             max_iter_to_alter, refine_steps, do_cfg), build)(
            latents, context, state, jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)
