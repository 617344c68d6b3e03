"""PhotoMaker: stacked-ID-embedding personalized SDXL.

Rebuild of the reference's PhotoMaker example (ppdiffusers/examples/
PhotoMaker/photomaker/model.py:33-122 PhotoMakerIDEncoder+FuseModule,
pipeline.py:211-288 trigger-word prompt encoding): ID reference images run
through a CLIP ViT-L tower with DUAL projections (768 + 1280 -> 2048 to
match the SDXL dual-encoder prompt width), and the fused embeddings replace
the class-word token positions in the prompt.

TPU twist: the reference's boolean masked_scatter over a dynamic number of
class tokens is replaced by a STATIC gather/where — position i takes id
embedding number cumsum(mask)[i]-1, fused embeddings are computed for every
position and selected by the mask, so the whole update jits with fixed
shapes for any num_id_images."""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...models.clip.configuration import CLIPVisionConfig
from ...models.clip.modeling import CLIPVisionTransformer
from .pipeline_utils import make_scheduler_state, register_pipeline
from .stable_diffusion import StableDiffusionXLPipeline


@dataclasses.dataclass
class PhotoMakerIDEncoderConfig(BaseConfig):
    model_type = "photomaker_id_encoder"
    vision_config: Optional[dict] = None
    embed_dim: int = 2048  # SDXL prompt width (768 + 1280)
    projection_dim: int = 768
    projection_dim_2: int = 1280

    def __post_init__(self):
        # reference VISION_CONFIG_DICT (model.py:22-30): CLIP ViT-L/14
        self.vision_config = self.vision_config or dict(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, patch_size=14, image_size=224,
            projection_dim=768)

    @property
    def vision(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.from_dict(self.vision_config)


class FuseModule(nn.Module):
    """mlp1(concat(prompt, id)) + prompt -> mlp2 (residual) -> LN
    (reference FuseModule, model.py:55-102)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, prompt_embeds, id_embeds, class_tokens_mask):
        d = self.embed_dim
        b, s, _ = prompt_embeds.shape
        mask = class_tokens_mask.astype(bool)
        # static scatter: the i-th masked position takes id embedding i
        idx = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0,
                       id_embeds.shape[1] - 1)
        id_at_pos = jnp.take_along_axis(
            id_embeds, idx[..., None], axis=1)  # (B, S, D)
        x = jnp.concatenate([prompt_embeds, id_at_pos], axis=-1)
        # mlp1 (no residual): LN -> fc -> gelu -> fc
        h = nn.LayerNorm(dtype=jnp.float32, name="mlp1_ln")(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(d, dtype=self.dtype, name="mlp1_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp1_fc2")(h)
        h = h + prompt_embeds
        # mlp2 (residual)
        r = h
        h = nn.LayerNorm(dtype=jnp.float32, name="mlp2_ln")(
            h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(d, dtype=self.dtype, name="mlp2_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp2_fc2")(h)
        h = h + r
        fused = nn.LayerNorm(dtype=jnp.float32, name="out_ln")(
            h.astype(jnp.float32)).astype(prompt_embeds.dtype)
        return jnp.where(mask[..., None], fused, prompt_embeds)


class PhotoMakerIDEncoderModule(nn.Module):
    config: PhotoMakerIDEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, id_pixel_values, prompt_embeds, class_tokens_mask):
        cfg = self.config
        b, n_ids, h, w, c = id_pixel_values.shape
        flat = id_pixel_values.reshape(b * n_ids, h, w, c)
        _, pooled = CLIPVisionTransformer(cfg.vision, dtype=self.dtype,
                                          name="vision_model")(flat)
        p1 = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                      name="visual_projection")(pooled)
        p2 = nn.Dense(cfg.projection_dim_2, use_bias=False, dtype=self.dtype,
                      name="visual_projection_2")(pooled)
        id_embeds = jnp.concatenate([p1, p2], axis=-1).reshape(
            b, n_ids, cfg.embed_dim)
        return FuseModule(cfg.embed_dim, dtype=self.dtype,
                          name="fuse_module")(prompt_embeds, id_embeds,
                                              class_tokens_mask)


class PhotoMakerIDEncoder(PretrainedModel):
    config_class = PhotoMakerIDEncoderConfig
    module_class = PhotoMakerIDEncoderModule

    @classmethod
    def example_inputs(cls, config):
        s = config.vision.image_size
        return ((jnp.zeros((1, 1, s, s, 3)),
                 jnp.zeros((1, 8, config.embed_dim)),
                 jnp.zeros((1, 8), jnp.int32)), {})


@register_pipeline
class PhotoMakerStableDiffusionXLPipeline(StableDiffusionXLPipeline):
    """SDXL with trigger-word ID conditioning (reference pipeline.py:211-520).
    Construct as the SDXL pipeline plus ``id_encoder`` and ``trigger_word``;
    call with ``input_id_images`` (list of HWC arrays in [0,1])."""

    def __init__(self, vae, text_encoder, text_encoder_2, tokenizer,
                 tokenizer_2, unet, scheduler, id_encoder=None,
                 trigger_word: str = "img", **kw):
        super().__init__(vae, text_encoder, text_encoder_2, tokenizer,
                         tokenizer_2, unet, scheduler, **kw)
        self.id_encoder = id_encoder
        self.trigger_word = trigger_word

    def encode_prompt_with_trigger_word(self, prompt: str,
                                        num_id_images: int = 1):
        """Strip the trigger token, duplicate the class token before it
        num_id_images times, mark those positions
        (reference pipeline.py:211-288)."""
        embeds_list = []
        pooled = None
        mask = None
        for tok, enc in ((self.tokenizer, self.text_encoder),
                         (self.tokenizer_2, self.text_encoder_2)):
            trigger_ids = tok.encode(self.trigger_word) \
                if hasattr(tok, "encode") else tok(self.trigger_word)
            # CLIP tokenizers bracket with bos/eos; the trigger is the inner
            # run (one token in the real vocab, possibly several in tiny
            # test vocabs — match the whole subsequence)
            specials = (getattr(tok, "bos_token_id", None),
                        getattr(tok, "eos_token_id", None))
            trig = [t for t in trigger_ids if t not in specials]
            input_ids = tok([prompt])["input_ids"][0].tolist()
            clean, class_idx = [], []
            i = 0
            while i < len(input_ids):
                if input_ids[i: i + len(trig)] == trig:
                    class_idx.append(len(clean) - 1)
                    i += len(trig)
                else:
                    clean.append(input_ids[i])
                    i += 1
            if len(class_idx) != 1:
                raise ValueError(
                    f"prompt must contain the trigger word "
                    f"{self.trigger_word!r} exactly once")
            ci = class_idx[0]
            clean = clean[:ci] + [clean[ci]] * num_id_images + clean[ci + 1:]
            max_len = getattr(tok, "model_max_length", 77)
            pad = getattr(tok, "pad_token_id", 0) or 0
            clean = (clean + [pad] * max_len)[:max_len]
            row_mask = [ci <= i < ci + num_id_images for i in range(max_len)]
            ids = jnp.asarray([clean], jnp.int32)
            _, pool, hiddens = enc(ids, output_hidden_states=True)
            embeds_list.append(hiddens[-2])
            pooled = pool
            mask = jnp.asarray([row_mask], jnp.int32)
        return jnp.concatenate(embeds_list, axis=-1), pooled, mask

    def __call__(self, prompt=None, input_id_images=None,
                 num_inference_steps: int = 50, guidance_scale: float = 5.0,
                 negative_prompt=None, height: int = 1024, width: int = 1024,
                 seed: int = 0, output_type: str = "pil", **kwargs):
        if input_id_images is None:
            raise ValueError("input_id_images is required for PhotoMaker")
        num_id = len(input_id_images)
        cond, pooled, mask = self.encode_prompt_with_trigger_word(
            prompt if isinstance(prompt, str) else prompt[0], num_id)
        id_px = jnp.stack([jnp.asarray(im, jnp.float32)
                           for im in input_id_images])[None]
        cond = self.id_encoder(id_px, cond, mask)
        # hand the fused embeds to the base SDXL denoise via prompt_embeds
        return self._call_with_embeds(cond, pooled, negative_prompt,
                                      height, width, num_inference_steps,
                                      guidance_scale, seed, output_type)

    def _call_with_embeds(self, cond, pooled, negative_prompt, height, width,
                          num_inference_steps, guidance_scale, seed,
                          output_type):
        neg = negative_prompt or ""
        # the uncond branch is the encoded negative prompt
        u_cond, _, u_pooled, _ = self.encode_prompt([neg], None)
        do_cfg = guidance_scale > 1.0
        context = jnp.concatenate([u_cond, cond]) if do_cfg else cond
        batch = cond.shape[0]
        add_time_ids = jnp.asarray(
            [[height, width, 0, 0, height, width]], jnp.float32)
        add_time_ids = jnp.broadcast_to(add_time_ids, (batch, 6))
        if do_cfg:
            add_text_embeds = jnp.concatenate([u_pooled, pooled])
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids])
        else:
            add_text_embeds = pooled
        lat_ch = self.unet.config.in_channels
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    dtype=jnp.float32)
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, add_text_embeds,
                        add_time_ids, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) \
                        if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        added_cond_kwargs={
                            "text_embeds": add_text_embeds.astype(unet.dtype),
                            "time_ids": add_time_ids}).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        denoise = self._jit.get(("pm_denoise", shape, num_inference_steps,
                                 do_cfg), build)
        latents = denoise(self.unet.params, latents, context, add_text_embeds,
                          add_time_ids, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)
