"""BLIP-Diffusion: subject-driven text-to-image (reference
ppdiffusers/pipelines/blip_diffusion): the BLIP-2 Q-Former encodes the
subject image into query tokens which are SPLICED into the CLIP text
embedding sequence (ContextCLIPTextModel, modeling_ctx_clip.py) right after
BOS; the SD UNet then denoises with that subject-grounded context."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...models.layers import EncoderBlock
from ...models.clip.configuration import CLIPTextConfig
from ...core.modeling import PretrainedModel
from .pipeline_utils import DiffusionPipeline, make_scheduler_state, register_pipeline
from .stable_diffusion import _JitCache


class ContextCLIPTextModule(nn.Module):
    """CLIP text tower whose embedding layer accepts spliced context tokens
    (reference modeling_ctx_clip.py ContextCLIPTextModel): ctx_embeddings are
    inserted after position ctx_begin_pos; positions cover the whole spliced
    sequence. Param names match the plain CLIP text tower, so SD text-encoder
    checkpoints load unchanged."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, ctx_embeddings=None, ctx_begin_pos: int = 1):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        if ctx_embeddings is not None:
            n_ctx = ctx_embeddings.shape[1]
            x = jnp.concatenate(
                [x[:, :ctx_begin_pos], ctx_embeddings.astype(x.dtype),
                 x[:, ctx_begin_pos:]], axis=1)
        s = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = x + pos[None, :s].astype(x.dtype)
        for i in range(cfg.num_hidden_layers):
            x = EncoderBlock(num_heads=cfg.num_attention_heads,
                             intermediate_size=cfg.intermediate_size,
                             activation=cfg.hidden_act, eps=cfg.layer_norm_eps,
                             dtype=self.dtype, name=f"layers_{i}")(x, causal=True)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)


class ContextCLIPTextModel(PretrainedModel):
    config_class = CLIPTextConfig
    module_class = ContextCLIPTextModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 8), jnp.int32),), {
            "ctx_embeddings": jnp.zeros((1, 4, config.hidden_size))}

    def __call__(self, input_ids, ctx_embeddings=None, ctx_begin_pos=1):
        return self.module.apply({"params": self.params},
                                 jnp.asarray(input_ids), ctx_embeddings,
                                 ctx_begin_pos)


@register_pipeline
class BlipDiffusionPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 qformer=None, image_processor=None):
        self.register_modules(vae=vae, text_encoder=text_encoder,
                              tokenizer=tokenizer, unet=unet,
                              scheduler=scheduler, qformer=qformer)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def encode_subject(self, reference_image):
        """Subject image -> query tokens via the BLIP-2 Q-Former stack
        (reference pipeline :127 get_query_embeddings)."""
        px = jnp.asarray(np.asarray(reference_image, np.float32))
        if px.ndim == 3:
            px = px[None]
        if px.max() > 1.5:
            px = px / 127.5 - 1.0
        return self.qformer.encode_image(px)  # (B, n_query, D)

    def __call__(self, prompt, reference_image, height: int = 512,
                 width: int = 512, num_inference_steps: int = 25,
                 guidance_scale: float = 7.5, seed: int = 0,
                 output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        if isinstance(prompt, str):
            prompt = [prompt]
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        ctx = self.encode_subject(reference_image)
        cond = self.text_encoder(ids, ctx_embeddings=ctx)
        uncond = self.text_encoder(ids, ctx_embeddings=jnp.zeros_like(ctx))
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        b = cond.shape[0]
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

        latents = self._jit.get(("blipd", shape, num_inference_steps, do_cfg),
                                build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        dec = self.vae.decode((latents / self.vae.config.scaling_factor)
                              .astype(self.vae.dtype)).astype(jnp.float32)
        return (np.asarray(jnp.clip(dec / 2 + 0.5, 0, 1)),)
