"""AudioLDM2 text-to-audio pipeline (reference
ppdiffusers/pipelines/audioldm2/pipeline_audioldm2.py): CLAP pooled embedding
+ T5 sequence -> projection model (learned SOS/EOS) -> GPT-2 generates 8
continuous prompt states -> dual-context UNet denoise -> mel VAE decode ->
HiFi-GAN vocoder."""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


@register_pipeline
class AudioLDM2Pipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, text_encoder_2, projection_model,
                 language_model, tokenizer, tokenizer_2, unet, scheduler, vocoder):
        self.register_modules(
            vae=vae, text_encoder=text_encoder, text_encoder_2=text_encoder_2,
            projection_model=projection_model, language_model=language_model,
            tokenizer=tokenizer, tokenizer_2=tokenizer_2, unet=unet,
            scheduler=scheduler, vocoder=vocoder)
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1) if vae else 8
        self._jit = _JitCache()

    def encode_prompt(self, prompt, max_new_tokens: int = 8):
        """reference pipeline_audioldm2.py:280-470 encode_prompt +
        generate_language_model: returns (generated_embeds, seq_embeds)."""
        if isinstance(prompt, str):
            prompt = [prompt]
        clap_ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        clap_embed = self.text_encoder(clap_ids)[0]  # (B, proj_dim)
        # reference scales the CLAP embedding by its L2 norm path; keep raw
        t5_ids = jnp.asarray(self.tokenizer_2(prompt)["input_ids"])
        t5_seq = self.text_encoder_2(t5_ids)  # (B, S, d)
        if isinstance(t5_seq, tuple):
            t5_seq = t5_seq[0]
        proj = self.projection_model(clap_embed[:, None, :], t5_seq)
        generated = self.language_model.generate_hidden_states(
            proj, num_new=max_new_tokens)
        return generated, proj

    def __call__(self, prompt: Union[str, List[str]] = None,
                 audio_length_in_s: float = 10.24,
                 num_inference_steps: int = 20, guidance_scale: float = 3.5,
                 negative_prompt=None, max_new_tokens: int = 8, seed: int = 0,
                 output_type: str = "np"):
        do_cfg = guidance_scale > 1.0
        generated, seq = self.encode_prompt(prompt, max_new_tokens)
        batch = generated.shape[0]
        if do_cfg:
            negative_prompt = negative_prompt or [""] * batch
            ng, ns = self.encode_prompt(negative_prompt, max_new_tokens)
            generated = jnp.concatenate([ng, generated])
            seq = jnp.concatenate([ns, seq])

        hop = self.vocoder.config.hop_length if self.vocoder else 1024
        mel_frames = int(audio_length_in_s * 16000 / hop)
        lat_t = max(mel_frames // self.vae_scale_factor, 1)
        lat_f = (self.vocoder.config.model_in_dim // self.vae_scale_factor
                 if self.vocoder else 8)
        shape = (batch, lat_t, lat_f, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, generated, seq, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        generated.astype(unet.dtype),
                        encoder_hidden_states_1=seq.astype(unet.dtype),
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

        denoise = self._jit.get(("audioldm2", shape, num_inference_steps, do_cfg),
                                build)
        latents = denoise(self.unet.params, latents, generated, seq, state,
                          jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        mel = self.vae.decode((latents / self.vae.config.scaling_factor
                               ).astype(self.vae.dtype)).astype(jnp.float32)
        mel = mel[..., 0] if mel.shape[-1] == 1 else mel.mean(-1)
        audio = self.vocoder.decode(mel.astype(self.vocoder.dtype)).astype(jnp.float32)
        return (np.asarray(audio),)
