"""UniDiffuser: joint image-text diffusion (reference
ppdiffusers/pipelines/unidiffuser/modeling_uvit.py UniDiffuserModel,
modeling_text_decoder.py UniDiffuserTextDecoder, pipeline_unidiffuser.py).

One U-ViT transformer denoises the concatenation [t_img tok, t_text tok,
77 CLIP-text latents, CLIP-image latent, VAE patches] with long skip
connections (concat + linear merge, U-Net style). Post-LN blocks
(pre_layer_norm=False in the reference). Modes: text2img / img2text / joint /
img / text, with UniDiffuser's noise-swap classifier-free guidance
(pipeline_unidiffuser.py:733-840)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ..models.embeddings import Timesteps, get_timestep_embedding
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@dataclasses.dataclass
class UniDiffuserConfig(BaseConfig):
    model_type = "unidiffuser"
    text_dim: int = 768
    clip_img_dim: int = 512
    num_text_tokens: int = 77
    num_attention_heads: int = 24
    attention_head_dim: int = 64
    in_channels: int = 4
    sample_size: int = 64
    patch_size: int = 2
    num_layers: int = 31  # odd: down half, mid, up half (U-ViT)


class _PostLNBlock(nn.Module):
    """UniDiffuser block: LayerNorm on the residual backbone (post-LN)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..models.attention import CrossAttention, GEGLUFeedForward

        x = x + CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                               name="attn1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + GEGLUFeedForward(dtype=self.dtype, name="ff")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x)


class UniDiffuserModule(nn.Module):
    config: UniDiffuserConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent_image_embeds, image_embeds, prompt_embeds,
                 timestep_img, timestep_text):
        cfg = self.config
        d = cfg.num_attention_heads * cfg.attention_head_dim
        b = latent_image_embeds.shape[0]
        p = cfg.patch_size
        grid = cfg.sample_size // p

        # patchify the NHWC VAE latent
        x = latent_image_embeds.reshape(b, grid, p, grid, p, cfg.in_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * grid, p * p * cfg.in_channels)
        vae_tok = nn.Dense(d, dtype=self.dtype, name="vae_img_in")(x)
        clip_tok = nn.Dense(d, dtype=self.dtype, name="clip_img_in")(image_embeds)
        text_tok = nn.Dense(d, dtype=self.dtype, name="text_in")(prompt_embeds)

        t_img = get_timestep_embedding(
            jnp.broadcast_to(timestep_img, (b,)), d, flip_sin_to_cos=True,
            downscale_freq_shift=0)[:, None, :].astype(self.dtype)
        t_text = get_timestep_embedding(
            jnp.broadcast_to(timestep_text, (b,)), d, flip_sin_to_cos=True,
            downscale_freq_shift=0)[:, None, :].astype(self.dtype)

        tokens = jnp.concatenate([t_img, t_text, text_tok, clip_tok, vae_tok], axis=1)
        num_tokens = 2 + cfg.num_text_tokens + 1 + grid * grid
        pos = self.param("pos_embed", nn.initializers.zeros, (1, num_tokens, d))
        tokens = tokens + pos.astype(self.dtype)

        half = cfg.num_layers // 2
        skips = []
        for i in range(half):
            tokens = _PostLNBlock(cfg.num_attention_heads, cfg.attention_head_dim,
                                  dtype=self.dtype, name=f"down_{i}")(tokens)
            skips.append(tokens)
        tokens = _PostLNBlock(cfg.num_attention_heads, cfg.attention_head_dim,
                              dtype=self.dtype, name="mid")(tokens)
        for i in range(half):
            merged = jnp.concatenate([tokens, skips.pop()], axis=-1)
            tokens = nn.Dense(d, dtype=self.dtype, name=f"skip_{i}")(merged)
            tokens = _PostLNBlock(cfg.num_attention_heads, cfg.attention_head_dim,
                                  dtype=self.dtype, name=f"up_{i}")(tokens)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm_out")(tokens)

        t_len = cfg.num_text_tokens
        text_out = nn.Dense(cfg.text_dim, dtype=self.dtype,
                            name="text_out")(tokens[:, 2:2 + t_len])
        clip_out = nn.Dense(cfg.clip_img_dim, dtype=self.dtype,
                            name="clip_img_out")(tokens[:, 2 + t_len:3 + t_len])
        vae_tokens = tokens[:, 3 + t_len:]
        vae_out = nn.Dense(p * p * cfg.in_channels, dtype=self.dtype,
                           name="vae_img_out")(vae_tokens)
        vae_out = vae_out.reshape(b, grid, grid, p, p, cfg.in_channels)
        vae_out = vae_out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, grid * p, grid * p, cfg.in_channels)
        return vae_out, clip_out, text_out


class UniDiffuserModel(PretrainedModel):
    config_class = UniDiffuserConfig
    module_class = UniDiffuserModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, config.sample_size, config.sample_size,
                            config.in_channels)),
                 jnp.zeros((1, 1, config.clip_img_dim)),
                 jnp.zeros((1, config.num_text_tokens, config.text_dim)),
                 jnp.zeros(()), jnp.zeros(())), {})


class UniDiffuserTextDecoder:
    """GPT-2 captioner over a projected prefix (reference
    modeling_text_decoder.py:32-237: encode_prefix / decode_prefix linears
    around a GPT-2 LM). Greedy decoding via the shared llama generate path."""

    def __init__(self, gpt2, encode_prefix_params=None, prefix_dim: int = 768):
        self.gpt2 = gpt2
        self.prefix_dim = prefix_dim
        d = gpt2.config.n_embd
        if encode_prefix_params is None:
            k = jax.random.PRNGKey(0)
            encode_prefix_params = {
                "kernel": jax.random.normal(k, (prefix_dim, d)) * 0.02,
                "bias": jnp.zeros((d,)),
            }
        self.encode_prefix_params = encode_prefix_params

    def generate_captions(self, text_latents, eos_token_id: int,
                          max_new_tokens: int = 16):
        prefix = (text_latents @ self.encode_prefix_params["kernel"]
                  + self.encode_prefix_params["bias"])
        b = prefix.shape[0]
        cache = self.gpt2.init_cache(b, prefix.shape[1] + max_new_tokens)
        positions = jnp.broadcast_to(jnp.arange(prefix.shape[1]), prefix.shape[:2])
        logits, cache = self.gpt2.module.apply(
            {"params": self.gpt2.params}, None, positions=positions,
            inputs_embeds=prefix.astype(self.gpt2.dtype), cache=cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)

        def step(carry, _):
            tok, cache = carry
            pos = cache.lengths[:, None]
            logits, cache = self.gpt2.module.apply(
                {"params": self.gpt2.params}, tok[:, None], positions=pos,
                cache=cache)
            nxt = jnp.argmax(logits[:, -1], axis=-1)
            return (nxt, cache), nxt

        (_, _), toks = jax.lax.scan(step, (tok, cache), None,
                                    length=max_new_tokens - 1)
        return jnp.concatenate([tok[:, None], toks.T], axis=1)


@register_pipeline
class UniDiffuserPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, image_encoder, clip_tokenizer,
                 text_decoder, text_tokenizer, unet, scheduler):
        self.register_modules(vae=vae, text_encoder=text_encoder,
                              image_encoder=image_encoder,
                              clip_tokenizer=clip_tokenizer,
                              text_decoder=text_decoder,
                              text_tokenizer=text_tokenizer, unet=unet,
                              scheduler=scheduler)
        self.mode = None
        self._jit = _JitCache()

    def set_text_mode(self):
        self.mode = "text"

    def set_image_mode(self):
        self.mode = "img"

    def set_text_to_image_mode(self):
        self.mode = "text2img"

    def set_image_to_text_mode(self):
        self.mode = "img2text"

    def set_joint_mode(self):
        self.mode = "joint"

    def _infer_mode(self, prompt, image):
        if self.mode is not None:
            return self.mode
        if prompt is not None:
            return "text2img"
        if image is not None:
            return "img2text"
        return "joint"

    def __call__(self, prompt=None, image=None, height: int = 512,
                 width: int = 512, num_inference_steps: int = 20,
                 guidance_scale: float = 8.0, seed: int = 0,
                 output_type: str = "np"):
        cfg = self.unet.config
        mode = self._infer_mode(prompt, image)
        key = jax.random.PRNGKey(seed)
        b = 1 if prompt is None else (1 if isinstance(prompt, str) else len(prompt))
        grid = cfg.sample_size

        # conditioning latents
        if prompt is not None:
            ids = jnp.asarray(self.clip_tokenizer(
                [prompt] if isinstance(prompt, str) else prompt)["input_ids"])
            text_lat = self.text_encoder(ids)[0][:, :cfg.num_text_tokens]
            if text_lat.shape[-1] != cfg.text_dim:
                text_lat = jnp.pad(text_lat,
                                   ((0, 0), (0, 0), (0, cfg.text_dim - text_lat.shape[-1])))
        else:
            text_lat = jax.random.normal(
                jax.random.fold_in(key, 1), (b, cfg.num_text_tokens, cfg.text_dim))
        if image is not None:
            img = jnp.asarray(np.asarray(image, np.float32))
            if img.ndim == 3:
                img = img[None]
            vae_lat = self.vae.encode(img.astype(self.vae.dtype)).mode()
            vae_lat = (vae_lat * self.vae.config.scaling_factor).astype(jnp.float32)
            clip_lat = self.image_encoder.encode_image(img)[:, None, :]
        else:
            vae_lat = jax.random.normal(jax.random.fold_in(key, 2),
                                        (b, grid, grid, cfg.in_channels))
            clip_lat = jax.random.normal(jax.random.fold_in(key, 3),
                                         (b, 1, cfg.clip_img_dim))

        # one scheduler state per latent stream (multistep solvers carry
        # per-sample history, so the three streams cannot share one state)
        import inspect

        def make_state(shape):
            sig = inspect.signature(self.scheduler.set_timesteps)
            if "sample_shape" in sig.parameters:
                return self.scheduler.set_timesteps(num_inference_steps,
                                                    sample_shape=shape)
            return self.scheduler.set_timesteps(num_inference_steps)

        vae_state = make_state((b, grid, grid, cfg.in_channels))
        clip_state = make_state((b, 1, cfg.clip_img_dim))
        text_state = make_state((b, cfg.num_text_tokens, cfg.text_dim))
        max_t = jnp.asarray(self.scheduler.config.num_train_timesteps - 1,
                            jnp.float32)
        unet, scheduler = self.unet, self.scheduler
        gs = jnp.asarray(guidance_scale, jnp.float32)
        do_cfg = guidance_scale > 1.0 and mode in ("text2img", "img2text", "joint")

        def apply(params, vae_x, clip_x, text_x, t_img, t_text):
            return unet.module.apply(
                {"params": params}, vae_x.astype(unet.dtype),
                clip_x.astype(unet.dtype), text_x.astype(unet.dtype),
                t_img, t_text)

        def build():
            def run(params, vae_lat, clip_lat, text_lat, states, key):
                def body(i, carry):
                    vae_x, clip_x, text_x, vs, cs, ts = carry
                    t = vs.timesteps[i].astype(jnp.float32)
                    if mode in ("text2img", "img"):
                        v, c, _ = apply(params, vae_x, clip_x, text_lat, t,
                                        jnp.float32(0))
                        if do_cfg:
                            tT = jax.random.normal(jax.random.fold_in(key, i),
                                                   text_lat.shape)
                            vu, cu, _ = apply(params, vae_x, clip_x, tT, t, max_t)
                            v = vu + gs * (v - vu)
                            c = cu + gs * (c - cu)
                        vae_x, vs = scheduler.step(vs, v, i, vae_x)
                        clip_x, cs = scheduler.step(cs, c, i, clip_x)
                        return vae_x, clip_x, text_x, vs, cs, ts
                    if mode in ("img2text", "text"):
                        _, _, tx = apply(params, vae_lat, clip_lat, text_x,
                                         jnp.float32(0), t)
                        if do_cfg:
                            vT = jax.random.normal(jax.random.fold_in(key, i),
                                                   vae_lat.shape)
                            cT = jax.random.normal(jax.random.fold_in(key, i + 9999),
                                                   clip_lat.shape)
                            _, _, tu = apply(params, vT, cT, text_x, max_t, t)
                            tx = tu + gs * (tx - tu)
                        text_x, ts = scheduler.step(ts, tx, i, text_x)
                        return vae_x, clip_x, text_x, vs, cs, ts
                    # joint
                    v, c, tx = apply(params, vae_x, clip_x, text_x, t, t)
                    vae_x, vs = scheduler.step(vs, v, i, vae_x)
                    clip_x, cs = scheduler.step(cs, c, i, clip_x)
                    text_x, ts = scheduler.step(ts, tx, i, text_x)
                    return vae_x, clip_x, text_x, vs, cs, ts

                init = (
                    jax.random.normal(jax.random.fold_in(key, 7), vae_lat.shape)
                    if mode in ("text2img", "img", "joint") else vae_lat,
                    jax.random.normal(jax.random.fold_in(key, 8), clip_lat.shape)
                    if mode in ("text2img", "img", "joint") else clip_lat,
                    jax.random.normal(jax.random.fold_in(key, 9), text_lat.shape)
                    if mode in ("img2text", "text", "joint") else text_lat,
                    *states,
                )
                out = jax.lax.fori_loop(0, num_inference_steps, body, init)
                return out[0], out[1], out[2]

            return jax.jit(run)

        ck = (mode, vae_lat.shape, num_inference_steps, do_cfg)
        vae_x, clip_x, text_x = self._jit.get(ck, build)(
            unet.params, vae_lat, clip_lat, text_lat,
            (vae_state, clip_state, text_state), key)

        result = {}
        if mode in ("text2img", "img", "joint"):
            img = self.vae.decode((vae_x / self.vae.config.scaling_factor
                                   ).astype(self.vae.dtype)).astype(jnp.float32)
            result["images"] = np.asarray(jnp.clip(img / 2 + 0.5, 0, 1))
        if mode in ("img2text", "text", "joint"):
            if self.text_decoder is not None:
                eos = getattr(self.text_tokenizer, "eos_token_id", 0) or 0
                result["token_ids"] = np.asarray(
                    self.text_decoder.generate_captions(text_x, eos))
                if self.text_tokenizer is not None and hasattr(
                        self.text_tokenizer, "decode"):
                    result["text"] = [self.text_tokenizer.decode(t)
                                      for t in result["token_ids"]]
            else:
                result["text_latents"] = np.asarray(text_x)
        return result
