"""MusicLDM text-to-music (reference ppdiffusers/pipelines/musicldm/
pipeline_musicldm.py): AudioLDM's latent mel diffusion with the CLAP text
tower (models/audioldm2.clap) as the conditioner — the pooled, L2-normalized
CLAP embedding cross-attends as a single token, same as AudioLDM."""

from __future__ import annotations

import jax.numpy as jnp

from .audioldm import AudioLDMPipeline
from .pipeline_utils import register_pipeline


@register_pipeline
class MusicLDMPipeline(AudioLDMPipeline):
    """Same denoise/vocoder machinery as AudioLDM; only the prompt encoder
    differs (ClapTextModelWithProjection -> projected pooled embedding)."""

    def encode_prompt(self, prompt, negative_prompt=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)

        def embed(texts):
            ids = jnp.asarray(self.tokenizer(texts)["input_ids"])
            out = self.text_encoder(ids)
            pooled = out[0] if isinstance(out, tuple) else out
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
            return pooled[:, None, :]

        return embed(prompt), embed(negative_prompt)
