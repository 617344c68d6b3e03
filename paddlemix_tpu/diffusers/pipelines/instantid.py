"""InstantID: identity-preserving SDXL via face embedding + pose ControlNet.

Rebuild of the reference's InstantID example (ppdiffusers/examples/
InstantID/pipeline_stable_diffusion_xl_instantid.py +
resampler.py:90-118): a perceiver Resampler projects the (512-d) face
recognition embedding into IP-Adapter image tokens consumed by the UNet's
decoupled cross-attention (ip_adapter_tokens in the repo's
UNet2DConditionConfig), while an SDXL ControlNet conditioned on the face
keypoint drawing steers layout. The uncond branch uses a zero face
embedding, matching the reference's CFG handling."""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .pipeline_utils import make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionXLPipeline


@dataclasses.dataclass
class InstantIDResamplerConfig(BaseConfig):
    model_type = "instantid_resampler"
    dim: int = 1280
    depth: int = 4
    dim_head: int = 64
    heads: int = 20
    num_queries: int = 16
    embedding_dim: int = 512   # face recognition embedding
    output_dim: int = 2048     # SDXL cross-attention width
    ff_mult: int = 4


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        b, m, _ = latents.shape
        xl = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        ll = nn.LayerNorm(dtype=jnp.float32)(latents.astype(jnp.float32))
        q = nn.Dense(inner, use_bias=False, name="to_q")(ll)
        kv_in = jnp.concatenate([xl, ll], axis=1)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        n = kv_in.shape[1]
        q = q.reshape(b, m, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(self.dim_head)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, m, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(
            out).astype(latents.dtype)


class InstantIDResamplerModule(nn.Module):
    config: InstantIDResamplerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b = x.shape[0]
        if x.ndim == 2:
            x = x[:, None]
        latents = self.param("latents",
                             nn.initializers.normal(cfg.dim ** -0.5),
                             (1, cfg.num_queries, cfg.dim))
        latents = jnp.broadcast_to(latents, (b,) + latents.shape[1:])
        latents = latents.astype(self.dtype)
        x = nn.Dense(cfg.dim, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype))
        for i in range(cfg.depth):
            latents = latents + PerceiverAttention(
                cfg.dim, cfg.dim_head, cfg.heads, dtype=self.dtype,
                name=f"attn_{i}")(x, latents)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ff_ln_{i}")(
                latents.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(cfg.dim * cfg.ff_mult, use_bias=False,
                         dtype=self.dtype, name=f"ff_fc1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.dim, use_bias=False, dtype=self.dtype,
                         name=f"ff_fc2_{i}")(h)
            latents = latents + h
        out = nn.Dense(cfg.output_dim, dtype=self.dtype,
                       name="proj_out")(latents)
        return nn.LayerNorm(dtype=jnp.float32, name="norm_out")(
            out.astype(jnp.float32)).astype(self.dtype)


class InstantIDResampler(PretrainedModel):
    config_class = InstantIDResamplerConfig
    module_class = InstantIDResamplerModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 1, config.embedding_dim)),), {})


@register_pipeline
class StableDiffusionXLInstantIDPipeline(StableDiffusionXLPipeline):
    """SDXL + face-embedding IP tokens + keypoint ControlNet. The unet must
    be configured with ip_adapter_tokens == resampler num_queries."""

    def __init__(self, vae, text_encoder, text_encoder_2, tokenizer,
                 tokenizer_2, unet, scheduler, controlnet=None,
                 image_proj_model=None, **kw):
        super().__init__(vae, text_encoder, text_encoder_2, tokenizer,
                         tokenizer_2, unet, scheduler, **kw)
        self.controlnet = controlnet
        self.image_proj_model = image_proj_model

    def __call__(self, prompt=None, image_embeds=None, image=None,
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 30, guidance_scale: float = 5.0,
                 controlnet_conditioning_scale: float = 1.0,
                 negative_prompt=None, seed: int = 0,
                 output_type: str = "pil", **kwargs):
        if image_embeds is None:
            raise ValueError("image_embeds (face embedding) is required")
        if image is None:
            raise ValueError("image (keypoint control image) is required")
        do_cfg = guidance_scale > 1.0
        cond, uncond, pooled, neg_pooled = self.encode_prompt(
            prompt, negative_prompt)
        batch = cond.shape[0]

        face = jnp.asarray(image_embeds, jnp.float32)
        if face.ndim == 1:
            face = face[None]
        ip_cond = self.image_proj_model(face)
        ip_uncond = self.image_proj_model(jnp.zeros_like(face))
        cond = jnp.concatenate([cond, ip_cond.astype(cond.dtype)], axis=1)
        uncond = jnp.concatenate([uncond, ip_uncond.astype(uncond.dtype)],
                                 axis=1)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        control = np.asarray(image, np.float32)
        if control.max() > 1.5:
            control = control / 255.0
        if control.ndim == 3:
            control = control[None]
        control = jnp.asarray(control)
        if control.shape[0] != batch:
            control = jnp.broadcast_to(control, (batch, *control.shape[1:]))
        control_in = jnp.concatenate([control, control]) if do_cfg else control

        add_time_ids = jnp.asarray(
            [[height, width, 0, 0, height, width]], jnp.float32)
        add_time_ids = jnp.broadcast_to(add_time_ids, (batch, 6))
        if do_cfg:
            add_text_embeds = jnp.concatenate([neg_pooled, pooled])
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids])
        else:
            add_text_embeds = pooled

        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, controlnet, scheduler = self.unet, self.controlnet, self.scheduler
        cscale = float(controlnet_conditioning_scale)
        n_text = context.shape[1] - self.unet.config.ip_adapter_tokens

        def build():
            def denoise(unet_params, cn_params, latents, context,
                        add_text_embeds, add_time_ids, control_in, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) \
                        if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    added = {"text_embeds": add_text_embeds.astype(unet.dtype),
                             "time_ids": add_time_ids}
                    # the reference conditions the controlnet on the TEXT
                    # portion only; ip tokens ride just the unet
                    down_res, mid_res = controlnet.module.apply(
                        {"params": cn_params},
                        lat_in.astype(controlnet.dtype), t_in,
                        context[:, :n_text].astype(controlnet.dtype),
                        control_in.astype(controlnet.dtype), cscale,
                        added_cond_kwargs=added)
                    pred = unet.module.apply(
                        {"params": unet_params}, lat_in.astype(unet.dtype),
                        t_in, context.astype(unet.dtype),
                        added_cond_kwargs=added,
                        down_block_additional_residuals=down_res,
                        mid_block_additional_residual=mid_res,
                    ).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        denoise = self._jit.get(("iid_denoise", shape, num_inference_steps,
                                 do_cfg), build)
        latents = denoise(self.unet.params, self.controlnet.params, latents,
                          context, add_text_embeds, add_time_ids, control_in,
                          state, jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)
