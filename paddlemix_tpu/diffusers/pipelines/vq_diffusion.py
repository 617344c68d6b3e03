"""VQ-Diffusion text-to-image (reference
ppdiffusers/pipelines/vq_diffusion/pipeline_vq_diffusion.py + the discrete
mode of models/transformer_2d.py): a transformer predicts log p(x_0) over the
VQ codebook for each latent token; the discrete mask-and-replace scheduler
resamples tokens; the VQ-VAE decodes the final token map.

The denoise loop (including Gumbel sampling and the log-space posterior)
is one jitted fori_loop over int32 token maps — no continuous latents."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ..models.attention import BasicTransformerBlock
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@dataclasses.dataclass
class VQDiffusionTransformerConfig(BaseConfig):
    model_type = "vq_diffusion_transformer"
    num_vec_classes: int = 4097     # codebook + mask
    height: int = 32
    width: int = 32
    num_layers: int = 12
    num_attention_heads: int = 8
    attention_head_dim: int = 64
    cross_attention_dim: int = 512
    num_train_timesteps: int = 100


class VQDiffusionTransformerModule(nn.Module):
    """Discrete Transformer2DModel (reference transformer_2d.py
    is_input_vectorized path): vocab + position embeddings, AdaLN-timestep
    transformer blocks with text cross-attention, log-softmax head over the
    embeddable (non-mask) classes."""

    config: VQDiffusionTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, timestep, encoder_hidden_states):
        cfg = self.config
        d = cfg.num_attention_heads * cfg.attention_head_dim
        b, n = tokens.shape
        x = nn.Embed(cfg.num_vec_classes, d, dtype=self.dtype,
                     name="latent_image_embedding")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.height * cfg.width, d))
        x = x + pos[None, :n].astype(x.dtype)
        # timestep conditioning via a broadcast embedding added per block input
        t_emb = nn.Embed(cfg.num_train_timesteps, d, dtype=self.dtype,
                         name="timestep_embedding")(
            jnp.broadcast_to(timestep, (b,)))
        for i in range(cfg.num_layers):
            x = x + t_emb[:, None, :]
            x = BasicTransformerBlock(cfg.num_attention_heads,
                                      cfg.attention_head_dim, dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(
                x, encoder_hidden_states)
        x = nn.LayerNorm(dtype=self.dtype, name="norm_out")(x)
        logits = nn.Dense(cfg.num_vec_classes - 1, dtype=self.dtype,
                          name="out")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


class VQDiffusionTransformerModel(PretrainedModel):
    config_class = VQDiffusionTransformerConfig
    module_class = VQDiffusionTransformerModule

    @classmethod
    def example_inputs(cls, config):
        n = config.height * config.width
        return (jnp.zeros((1, n), jnp.int32), jnp.asarray(0),
                jnp.zeros((1, 8, config.cross_attention_dim))), {}


@register_pipeline
class VQDiffusionPipeline(DiffusionPipeline):
    def __init__(self, vqvae, text_encoder, tokenizer, transformer, scheduler):
        self.register_modules(vqvae=vqvae, text_encoder=text_encoder,
                              tokenizer=tokenizer, transformer=transformer,
                              scheduler=scheduler)
        self._jit = _JitCache()

    def __call__(self, prompt, num_inference_steps: int = 100,
                 guidance_scale: float = 5.0,
                 truncation_rate: float = 1.0, seed: int = 0,
                 output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        do_cfg = guidance_scale > 1.0
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        cond = self.text_encoder(ids)[0]
        if do_cfg:
            un_ids = jnp.asarray(self.tokenizer([""] * len(prompt))["input_ids"])
            uncond = self.text_encoder(un_ids)[0]
            context = jnp.concatenate([uncond, cond])
        else:
            context = cond

        cfg_t = self.transformer.config
        b = cond.shape[0]
        n = cfg_t.height * cfg_t.width
        mask_class = self.scheduler.mask_class
        sample = jnp.full((b, n), mask_class, jnp.int32)  # start fully masked
        state = self.scheduler.set_timesteps(num_inference_steps)
        steps = state.num_inference_steps
        transformer, scheduler = self.transformer, self.scheduler
        key = jax.random.PRNGKey(seed)

        def build():
            def run(params, sample, context, state, gs, key):
                def body(i, carry):
                    sample, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    tok_in = jnp.concatenate([sample, sample]) if do_cfg else sample
                    logp = transformer.module.apply(
                        {"params": params}, tok_in, t,
                        context.astype(transformer.dtype))
                    if do_cfg:
                        un, co = jnp.split(logp, 2)
                        logp = un + gs * (co - un)
                        logp = logp - jax.scipy.special.logsumexp(
                            logp, axis=-1, keepdims=True)
                    if truncation_rate < 1.0:
                        # keep only the top-p mass (reference truncate())
                        srt = jnp.sort(jnp.exp(logp), axis=-1)[..., ::-1]
                        cum = jnp.cumsum(srt, axis=-1)
                        cut_idx = jnp.sum(cum < truncation_rate, axis=-1)
                        cut = jnp.take_along_axis(
                            srt, cut_idx[..., None], axis=-1)
                        logp = jnp.where(jnp.exp(logp) >= cut, logp, -70.0)
                    sample, _ = scheduler.step(state, logp, i, sample, key=sub)
                    return sample, key

                out, _ = jax.lax.fori_loop(0, steps, body, (sample, key))
                return out

            return jax.jit(run)

        tokens = self._jit.get(("vqd", (b, n), steps, do_cfg,
                                truncation_rate), build)(
            self.transformer.params, sample, context, state,
            jnp.asarray(guidance_scale, jnp.float32), key)

        # decode the token map through the VQ-VAE codebook
        img = self.vqvae.decode_code(tokens, shape=(b, cfg_t.height,
                                                    cfg_t.width))
        img = np.asarray(jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0, 1))
        return (img,)
