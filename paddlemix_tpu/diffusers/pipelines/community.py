"""Community pipelines (reference ppdiffusers/examples/community/):

- long-prompt-weighting SD (lpw_stable_diffusion.py): ``(word:1.3)`` /
  ``[word]`` attention syntax, >77-token prompts via chunked encoding,
  mean-preserving embedding reweighting.
- hires-fix SD (stable_diffusion_hires_fix.py): low-res denoise, latent
  upscale, strength-gated second pass.
- checkpoint merger (checkpoint_merger.py): weighted / add-difference
  merges over param pytrees.
- prompt/latent interpolation walks (interpolate_stable_diffusion.py):
  slerp between seeds/embeddings.
- CLIP-guided SD (clip_guided_stable_diffusion.py): per-step gradient of
  CLIP similarity wrt latents — jax.grad makes the guidance term exact.
"""

from __future__ import annotations

import re
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import register_pipeline
from .stable_diffusion import StableDiffusionPipeline

# ---------------------------------------------------------------- LPW parse
_ATTN_RE = re.compile(
    r"\\\(|\\\)|\\\[|\\]|\\\\|\\|\(|\[|:([+-]?[.\d]+)\)|\)|]|[^\\()\[\]:]+|:",
    re.X)


def parse_prompt_attention(text: str):
    """``(abc)`` -> x1.1, ``(abc:1.5)`` -> x1.5, ``[abc]`` -> /1.1,
    ``\\(`` etc. literal (reference lpw_stable_diffusion.py
    parse_prompt_attention)."""
    res: List[List] = []
    round_brackets: List[int] = []
    square_brackets: List[int] = []

    def multiply_range(start, mult):
        for p in range(start, len(res)):
            res[p][1] *= mult

    for m in _ATTN_RE.finditer(text):
        tok = m.group(0)
        weight = m.group(1)
        if tok.startswith("\\"):
            res.append([tok[1:], 1.0])
        elif tok == "(":
            round_brackets.append(len(res))
        elif tok == "[":
            square_brackets.append(len(res))
        elif weight is not None and round_brackets:
            multiply_range(round_brackets.pop(), float(weight))
        elif tok == ")" and round_brackets:
            multiply_range(round_brackets.pop(), 1.1)
        elif tok == "]" and square_brackets:
            multiply_range(square_brackets.pop(), 1 / 1.1)
        else:
            res.append([tok, 1.0])
    for pos in round_brackets:
        multiply_range(pos, 1.1)
    for pos in square_brackets:
        multiply_range(pos, 1 / 1.1)
    if not res:
        res = [["", 1.0]]
    # merge runs with identical weight
    i = 0
    while i + 1 < len(res):
        if res[i][1] == res[i + 1][1]:
            res[i][0] += res[i + 1][0]
            del res[i + 1]
        else:
            i += 1
    return res


def get_weighted_text_embeddings(tokenizer, text_encoder, prompt,
                                 max_embeddings_multiples: int = 3):
    """Chunked weighted embeddings (reference get_weighted_text_embeddings):
    per-token weights from the attention grammar, N chunks of
    (model_max_length-2) tokens each bos/eos-wrapped and encoded separately,
    embeddings scaled by weight then mean-restored."""
    if isinstance(prompt, str):
        prompt = [prompt]
    chunk = tokenizer.model_max_length
    cap = (chunk - 2) * max_embeddings_multiples

    all_tokens, all_weights = [], []
    for text in prompt:
        toks: List[int] = []
        wts: List[float] = []
        for piece, w in parse_prompt_attention(text):
            ids = tokenizer.encode(piece)
            toks += ids
            wts += [w] * len(ids)
        toks, wts = toks[:cap], wts[:cap]
        all_tokens.append(toks)
        all_weights.append(wts)

    n_chunks = max(1, max((len(t) + chunk - 3) // (chunk - 2)
                          for t in all_tokens))
    bos, eos, pad = (tokenizer.bos_token_id, tokenizer.eos_token_id,
                     tokenizer.pad_token_id)
    ids = np.full((len(prompt), n_chunks, chunk), pad, np.int32)
    wts = np.ones((len(prompt), n_chunks, chunk), np.float32)
    ids[:, :, 0] = bos
    for b, (toks, w) in enumerate(zip(all_tokens, all_weights)):
        for c in range(n_chunks):
            seg = toks[c * (chunk - 2):(c + 1) * (chunk - 2)]
            wseg = w[c * (chunk - 2):(c + 1) * (chunk - 2)]
            ids[b, c, 1:1 + len(seg)] = seg
            ids[b, c, 1 + len(seg)] = eos
            wts[b, c, 1:1 + len(wseg)] = wseg

    flat = jnp.asarray(ids.reshape(-1, chunk))
    out = text_encoder(flat)
    emb = (out[0] if isinstance(out, tuple) else out)
    emb = emb.reshape(len(prompt), n_chunks * chunk, -1).astype(jnp.float32)
    w = jnp.asarray(wts.reshape(len(prompt), n_chunks * chunk, 1))
    prev_mean = emb.mean(axis=(-2, -1))
    emb = emb * w
    emb = emb * (prev_mean / emb.mean(axis=(-2, -1)))[:, None, None]
    return emb


@register_pipeline
class StableDiffusionLongPromptPipeline(StableDiffusionPipeline):
    """SD with the lpw prompt grammar and unlimited prompt length."""

    max_embeddings_multiples: int = 3

    def encode_prompt(self, prompt, negative_prompt=None,
                      clip_skip: Optional[int] = None):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        m = self.max_embeddings_multiples
        cond = get_weighted_text_embeddings(self.tokenizer, self.text_encoder,
                                            prompt, m)
        uncond = get_weighted_text_embeddings(self.tokenizer,
                                              self.text_encoder,
                                              negative_prompt, m)
        # CFG concat needs equal chunk counts
        if cond.shape[1] != uncond.shape[1]:
            n = max(cond.shape[1], uncond.shape[1])

            def tile_to(e):
                reps = -(-n // e.shape[1])
                return jnp.tile(e, (1, reps, 1))[:, :n]

            cond, uncond = tile_to(cond), tile_to(uncond)
        return cond, uncond


# ----------------------------------------------------------- merger / slerp
def merge_checkpoints(params_list, alpha: float = 0.5,
                      interp: str = "weighted"):
    """Merge 2 (weighted) or 3 (add_difference) param pytrees (reference
    checkpoint_merger.py): weighted = (1-a)*A + a*B; add_difference =
    A + a*(B - C)."""
    if interp == "weighted":
        a, b = params_list
        return jax.tree_util.tree_map(
            lambda x, y: (1.0 - alpha) * x + alpha * y, a, b)
    if interp == "add_difference":
        a, b, c = params_list
        return jax.tree_util.tree_map(
            lambda x, y, z: x + alpha * (y - z), a, b, c)
    raise ValueError(f"unknown interp {interp!r}")


def slerp(t, v0, v1, dot_threshold: float = 0.9995):
    """Spherical interpolation (reference interpolate_stable_diffusion.py)."""
    v0f, v1f = v0.reshape(-1), v1.reshape(-1)
    dot = jnp.sum(v0f * v1f) / (jnp.linalg.norm(v0f) * jnp.linalg.norm(v1f))
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    lerp = (1.0 - t) * v0 + t * v1
    sl = (jnp.sin((1.0 - t) * theta) * v0 + jnp.sin(t * theta) * v1) \
        / jnp.where(sin_theta == 0, 1.0, sin_theta)
    return jnp.where(jnp.abs(dot) > dot_threshold, lerp, sl)


@register_pipeline
class StableDiffusionWalkPipeline(StableDiffusionPipeline):
    """Latent/embedding walks between two prompts+seeds (reference
    interpolate_stable_diffusion.py walk())."""

    def walk(self, prompt_a: str, prompt_b: str, steps: int = 4,
             seed_a: int = 0, seed_b: int = 1, height: int = 512,
             width: int = 512, num_inference_steps: int = 25,
             guidance_scale: float = 7.5, output_type: str = "np"):
        ca, _ = self.encode_prompt([prompt_a])
        cb, _ = self.encode_prompt([prompt_b])
        shape = (1, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        la = jax.random.normal(jax.random.PRNGKey(seed_a), shape, jnp.float32)
        lb = jax.random.normal(jax.random.PRNGKey(seed_b), shape, jnp.float32)
        frames = []
        for i in range(steps):
            t = i / max(steps - 1, 1)
            emb = slerp(t, ca, cb)
            lat = slerp(t, la, lb)
            img = self.__call__(
                prompt="", latents=lat, height=height, width=width,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, output_type=output_type,
                _context_override=emb)
            frames.append(img[0])
        return frames

    # reuse the parent loop but swap the conditioning
    def encode_prompt(self, prompt, negative_prompt=None, clip_skip=None):
        if getattr(self, "_ctx_override", None) is not None:
            cond = self._ctx_override
            uncond = jnp.zeros_like(cond)
            return cond, uncond
        return super().encode_prompt(prompt, negative_prompt, clip_skip)

    def __call__(self, *args, _context_override=None, **kwargs):
        self._ctx_override = _context_override
        try:
            return super().__call__(*args, **kwargs)
        finally:
            self._ctx_override = None


@register_pipeline
class StableDiffusionHiresFixPipeline(StableDiffusionPipeline):
    """Two-pass hires fix (reference stable_diffusion_hires_fix.py): denoise
    at base resolution, bilinear-upscale the latents, re-noise to
    ``hires_strength`` and run the tail of the schedule at the target size."""

    def __call__(self, prompt, height: int = 768, width: int = 768,
                 base_size: int = 512, hires_strength: float = 0.6,
                 num_inference_steps: int = 30, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0,
                 output_type: str = "pil", **kwargs):
        low = super().__call__(
            prompt, height=base_size, width=base_size,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, negative_prompt=negative_prompt,
            seed=seed, output_type="latent")[0]
        hi_shape = (low.shape[0], height // self.vae_scale_factor,
                    width // self.vae_scale_factor, low.shape[-1])
        up = jax.image.resize(low, hi_shape, method="bilinear")

        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        state = self.scheduler.set_timesteps(num_inference_steps)
        t_start = max(num_inference_steps
                      - int(num_inference_steps * hires_strength), 0)
        noise = jax.random.normal(jax.random.PRNGKey(seed + 1), hi_shape,
                                  jnp.float32)
        t0 = state.timesteps[t_start].astype(jnp.int32)
        if hasattr(state, "sigmas"):
            latents = up + state.sigmas[t_start] * noise
        else:
            latents = self.scheduler.add_noise(up, noise, t0[None])

        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = (jnp.concatenate([latents, latents])
                              if do_cfg else latents)
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

                latents, _ = jax.lax.fori_loop(t_start, num_inference_steps,
                                               body, (latents, state))
                return latents

            return jax.jit(denoise)

        latents = self._jit.get(("hires", hi_shape, num_inference_steps,
                                 t_start, do_cfg), build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class CLIPGuidedStableDiffusionPipeline(StableDiffusionPipeline):
    """CLIP-guided SD (reference clip_guided_stable_diffusion.py): each step
    nudges the latents along d/d(latents) of the CLIP(image, text) cosine
    similarity of the predicted x0 decode — exact via jax.grad."""

    def set_clip(self, clip_model, clip_tokenizer):
        self.clip_model = clip_model
        self.clip_tokenizer = clip_tokenizer

    def __call__(self, prompt, clip_prompt=None, clip_guidance_scale: float = 100.0,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 25, guidance_scale: float = 7.5,
                 negative_prompt=None, seed: int = 0,
                 output_type: str = "pil", **kwargs):
        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        batch = cond.shape[0]
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma

        ids = jnp.asarray(self.clip_tokenizer(
            [clip_prompt or (prompt if isinstance(prompt, str) else prompt[0])]
        )["input_ids"])
        text_feat = self.clip_model.encode_text(ids)
        text_feat = text_feat / jnp.linalg.norm(text_feat, axis=-1,
                                                keepdims=True)
        unet, scheduler, vae, clip = (self.unet, self.scheduler, self.vae,
                                      self.clip_model)
        vc = getattr(clip.config, "vision_config", None) or {}
        img_size = (vc.get("image_size", 224) if isinstance(vc, dict)
                    else getattr(vc, "image_size", 224))

        alphas_bar = self.scheduler.alphas_cumprod

        def build():
            def denoise(unet_params, vae_params, clip_params, latents,
                        context, state, gs, cgs, text_feat):
                def clip_loss(lat, eps, t_idx):
                    # predicted x0 from eps (DDPM parameterization)
                    ab = alphas_bar[state.timesteps[t_idx]]
                    x0 = (lat - jnp.sqrt(1 - ab) * eps) / jnp.sqrt(ab)
                    img = vae.module.apply(
                        {"params": vae_params},
                        (x0 / vae.config.scaling_factor).astype(vae.dtype),
                        method=vae.module.decode).astype(jnp.float32)
                    img = jax.image.resize(
                        img, (img.shape[0], img_size, img_size, img.shape[-1]),
                        method="bilinear")
                    img = (img + 1.0) / 2.0
                    feat = clip.module.apply({"params": clip_params}, img,
                                             method=clip.module.encode_image)
                    feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
                    return -jnp.sum(feat * text_feat)

                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = (jnp.concatenate([latents, latents])
                              if do_cfg else latents)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": unet_params}, lat_in.astype(unet.dtype),
                        t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    g = jax.grad(clip_loss)(latents, pred, i)
                    pred = pred + cgs * g
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("clipguided", shape, num_inference_steps,
                                 do_cfg), build)(
            self.unet.params, self.vae.params, self.clip_model.params,
            latents, context, state, jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(clip_guidance_scale, jnp.float32), text_feat)
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class StableDiffusionReferencePipeline(StableDiffusionPipeline):
    """Reference-only generation (reference
    examples/community/reference_only.py): at every step the reference
    image's latent, noised to the same timestep, runs through the SAME UNet
    in a "write" pass capturing each self-attention block's pre-attn1 normed
    hidden states; the generation pass then attends over [self ++ reference]
    K/V (the UNet2DCondition reference_features hook)."""

    def __call__(self, prompt, image=None, height: int = 512,
                 width: int = 512, num_inference_steps: int = 25,
                 guidance_scale: float = 7.5, negative_prompt=None,
                 seed: int = 0, output_type: str = "pil",
                 style_fidelity: float = 1.0, **kwargs):
        from ..models.animate_anyone import extract_reference_features

        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond
        batch = cond.shape[0]
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma

        init = jnp.asarray(self.image_processor.preprocess(image))
        ref_lat = self.vae.encode(init.astype(self.vae.dtype)).mode() \
            .astype(jnp.float32) * self.vae.config.scaling_factor
        if ref_lat.shape[0] != batch:
            ref_lat = jnp.broadcast_to(ref_lat, (batch, *ref_lat.shape[1:]))

        unet, scheduler = self.unet, self.scheduler
        n_ctx = context.shape[0]

        def build():
            def denoise(params, latents, ref_lat, context, state, gs, key):
                def body(i, carry):
                    latents, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    # "write": reference latent at the same timestep
                    noise = jax.random.normal(sub, ref_lat.shape)
                    ref_t = scheduler.add_noise(ref_lat, noise,
                                                t[None].astype(jnp.int32))
                    ref_in = (jnp.concatenate([ref_t, ref_t])
                              if do_cfg else ref_t)
                    t_in = jnp.broadcast_to(t, (n_ctx,))
                    _, st = unet.module.apply(
                        {"params": params}, ref_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        capture_intermediates=lambda m, _:
                            type(m).__name__ == "LayerNorm"
                            and m.name == "norm1"
                            and any(str(p).startswith("transformer_blocks")
                                    for p in m.path))
                    flat = jax.tree_util.tree_flatten_with_path(
                        st["intermediates"])[0]
                    named = []
                    for keypath, value in flat:
                        path = tuple(getattr(k, "key", str(k))
                                     for k in keypath)
                        if "norm1" not in path:
                            continue
                        named.append((tuple(p for p in path
                                            if p != "__call__"), value))
                    from ..models.animate_anyone import _path_sort_key
                    named.sort(key=lambda kv: _path_sort_key(kv[0]))
                    refs = [v[0] if isinstance(v, tuple) else v
                            for _, v in named]

                    # "read": generate attending over [self ++ ref] K/V
                    lat_in = (jnp.concatenate([latents, latents])
                              if do_cfg else latents)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    pred = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype),
                        reference_features=list(refs)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(
                    0, num_inference_steps, body,
                    (latents, state, jax.random.PRNGKey(seed + 1)))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("refonly", shape, num_inference_steps,
                                 do_cfg), build)(
            self.unet.params, latents, ref_lat, context, state,
            jnp.asarray(guidance_scale, jnp.float32),
            jax.random.PRNGKey(seed + 1))
        if output_type == "latent":
            return (latents,)
        image_out = self._decode_latents(latents)
        return (self.image_processor.postprocess(image_out, output_type),)


@register_pipeline
class ComposableStableDiffusionPipeline(StableDiffusionPipeline):
    """Composable diffusion (reference
    examples/community/composable_stable_diffusion.py): '|'-separated
    sub-prompts each get their own noise prediction; guidance combines the
    weighted sum against the unconditional score. All sub-prompts run in ONE
    batched UNet call (the reference loops and chunks)."""

    def __call__(self, prompt, weights: str = "", height: int = 512,
                 width: int = 512, num_inference_steps: int = 25,
                 guidance_scale: float = 7.5, negative_prompt=None,
                 seed: int = 0, output_type: str = "pil", **kwargs):
        prompts = ([x.strip() for x in prompt.split("|")]
                   if isinstance(prompt, str) else list(prompt))
        n = len(prompts)
        if weights:
            w = [float(x.strip()) for x in weights.split("|")]
            assert len(w) == n, "one weight per '|'-separated prompt"
            pos_w = jnp.asarray(w, jnp.float32)
        else:
            pos_w = jnp.full((n,), 1.0 / n, jnp.float32)

        cond, uncond = self.encode_prompt(prompts,
                                          [negative_prompt or ""] * n)
        context = jnp.concatenate([uncond[:1], cond])  # 1 uncond + n conds

        shape = (1, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, gs, pos_w):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.broadcast_to(latents,
                                              (n + 1, *latents.shape[1:]))
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (n + 1,))
                    preds = unet.module.apply(
                        {"params": params}, lat_in.astype(unet.dtype), t_in,
                        context.astype(unet.dtype)).astype(jnp.float32)
                    eps_un = preds[:1]
                    eps_pos = jnp.einsum("n,nhwc->hwc", pos_w, preds[1:])[None]
                    pred = eps_un + gs * (eps_pos - eps_un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("composable", shape, n,
                                 num_inference_steps), build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32), pos_w)
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


# ----------------------------------------------------------------- wildcard
_WILDCARD_RE = re.compile(r"__([^_]*)__")


def replace_prompt_with_wildcards(prompt: str, wildcard_option_dict=None,
                                  wildcard_files=None, seed: int = 0) -> str:
    """``__animal__`` placeholders -> random value from the named list or
    <name>.txt file (reference wildcard_stable_diffusion.py)."""
    import random

    options = dict(wildcard_option_dict or {})
    for path in wildcard_files or []:
        import os

        name = os.path.splitext(os.path.basename(path))[0]
        with open(path, encoding="utf-8") as f:
            options.setdefault(name, []).extend(
                ln.strip() for ln in f if ln.strip())
    rng = random.Random(seed)

    def sub(m):
        name = m.group(1)
        values = options.get(name)
        if not values:
            raise ValueError(f"no wildcard values for __{name}__")
        return rng.choice(values)

    return _WILDCARD_RE.sub(sub, prompt)


@register_pipeline
class WildcardStableDiffusionPipeline(StableDiffusionPipeline):
    """SD with __wildcard__ prompt randomization (reference
    wildcard_stable_diffusion.py)."""

    def __call__(self, prompt, wildcard_option_dict=None,
                 wildcard_files=None, seed: int = 0, **kwargs):
        if isinstance(prompt, str):
            prompt = replace_prompt_with_wildcards(
                prompt, wildcard_option_dict, wildcard_files, seed)
        else:
            prompt = [replace_prompt_with_wildcards(
                p, wildcard_option_dict, wildcard_files, seed + i)
                for i, p in enumerate(prompt)]
        return super().__call__(prompt, seed=seed, **kwargs)


class StableDiffusionMegaPipeline(StableDiffusionPipeline):
    """One pipeline exposing .text2img/.img2img/.inpaint_legacy (reference
    stable_diffusion_mega.py) over shared components."""

    def text2img(self, *args, **kwargs):
        return StableDiffusionPipeline.__call__(self, *args, **kwargs)

    def img2img(self, *args, **kwargs):
        from .stable_diffusion_img2img import StableDiffusionImg2ImgPipeline

        return StableDiffusionImg2ImgPipeline.__call__(self, *args, **kwargs)

    def inpaint_legacy(self, *args, **kwargs):
        from .stable_diffusion_img2img import StableDiffusionInpaintPipeline

        return StableDiffusionInpaintPipeline.__call__(self, *args, **kwargs)


# ------------------------------------------------------------ mixture tiling
def _gaussian_tile_weights(th: int, tw: int, ch: int) -> np.ndarray:
    """Per-pixel gaussian blend weights for one tile (reference
    mixture_tiling.py _gaussian_weights)."""
    var = 0.01
    mid_y, mid_x = (th - 1) / 2, (tw - 1) / 2
    y = np.arange(th)
    x = np.arange(tw)
    wy = np.exp(-((y - mid_y) ** 2) / (th * th * var))
    wx = np.exp(-((x - mid_x) ** 2) / (tw * tw * var))
    w = np.outer(wy, wx)
    return np.repeat(w[:, :, None], ch, axis=2).astype(np.float32)


@register_pipeline
class StableDiffusionTilingPipeline(StableDiffusionPipeline):
    """Mixture-of-diffusers tiling (reference mixture_tiling.py): a grid of
    overlapping tiles, one prompt per tile; every step runs ALL tiles as one
    batched UNet call (the reference loops tile-by-tile) and blends the
    per-tile noise predictions with gaussian weights."""

    def __call__(self, prompt, tile_height: int = 64, tile_width: int = 64,
                 tile_row_overlap: int = 32, tile_col_overlap: int = 32,
                 num_inference_steps: int = 25, guidance_scale: float = 7.5,
                 negative_prompt: str = "", seed: int = 0,
                 output_type: str = "pil"):
        assert isinstance(prompt, list) and prompt \
            and all(isinstance(r, list) for r in prompt), \
            "prompt must be a grid: list of rows of strings"
        rows, cols = len(prompt), len(prompt[0])
        sf = self.vae_scale_factor
        th, tw = tile_height // sf, tile_width // sf
        dy, dx = th - tile_row_overlap // sf, tw - tile_col_overlap // sf
        H = th + (rows - 1) * dy
        W = tw + (cols - 1) * dx

        flat_prompts = [p for row in prompt for p in row]
        n = len(flat_prompts)
        cond, uncond = self.encode_prompt(flat_prompts,
                                          [negative_prompt] * n)
        do_cfg = guidance_scale > 1.0
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        lat_ch = self.unet.config.in_channels
        shape = (1, H, W, lat_ch)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        from .pipeline_utils import make_scheduler_state
        state = make_scheduler_state(self.scheduler, num_inference_steps,
                                     sample_shape=shape)
        latents = latents * self.scheduler.init_noise_sigma

        offs = [(r * dy, c * dx) for r in range(rows) for c in range(cols)]
        tile_w = jnp.asarray(_gaussian_tile_weights(th, tw, lat_ch))
        # precompute the per-pixel weight normalizer
        norm = np.zeros((H, W, lat_ch), np.float32)
        for y0, x0 in offs:
            norm[y0:y0 + th, x0:x0 + tw] += np.asarray(tile_w)
        norm_j = jnp.asarray(np.maximum(norm, 1e-8))
        unet, scheduler = self.unet, self.scheduler

        def build():
            def denoise(params, latents, context, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    tiles = jnp.concatenate([
                        jax.lax.dynamic_slice(
                            latents, (0, y0, x0, 0), (1, th, tw, lat_ch))
                        for y0, x0 in offs])
                    tiles_in = scheduler.scale_model_input(
                        state,
                        jnp.concatenate([tiles, tiles]) if do_cfg else tiles,
                        i)
                    t_in = jnp.broadcast_to(t, (tiles_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": params}, tiles_in.astype(unet.dtype),
                        t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    eps = jnp.zeros_like(latents)
                    for k, (y0, x0) in enumerate(offs):
                        eps = jax.lax.dynamic_update_slice(
                            eps,
                            jax.lax.dynamic_slice(
                                eps, (0, y0, x0, 0), (1, th, tw, lat_ch))
                            + pred[k:k + 1] * tile_w[None],
                            (0, y0, x0, 0))
                    eps = eps / norm_j[None]
                    latents, state = scheduler.step(state, eps, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("tiling", shape, n, num_inference_steps,
                                 do_cfg), build)(
            self.unet.params, latents, context, state,
            jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


# --------------------------------------------------------------------- EDICT
@register_pipeline
class EDICTPipeline(StableDiffusionPipeline):
    """EDICT exact-inversion editing (reference
    examples/community/edict_pipeline.py): two coupled latent streams with
    affine mixing layers make the DDIM walk exactly invertible — invert the
    real image under the base prompt, then denoise under the target prompt.
    Both directions run as single jitted fori_loops."""

    mixing_coeff: float = 0.93
    leapfrog_steps: bool = True

    def _coeffs(self, state, num_inference_steps):
        """(a_t, b_t) per schedule index (reference _get_alpha_and_beta +
        denoise_step), precomputed host-side."""
        acp = np.asarray(self.scheduler.alphas_cumprod)
        n_train = len(acp)
        ts = np.asarray(state.timesteps)
        prev = ts - n_train // num_inference_steps
        ap_t = acp[ts]
        ap_prev = np.where(prev >= 0, acp[np.clip(prev, 0, None)], 1.0)
        a = np.sqrt(ap_prev / ap_t)
        b = -a * np.sqrt(1 - ap_t) + np.sqrt(1 - ap_prev)
        return jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)

    def __call__(self, base_prompt: str, target_prompt: str, image=None,
                 guidance_scale: float = 3.0, num_inference_steps: int = 50,
                 strength: float = 0.8, negative_prompt=None,
                 output_type: str = "pil"):
        do_cfg = guidance_scale > 1.0
        bc, bu = self.encode_prompt(base_prompt, negative_prompt)
        tc, tu = self.encode_prompt(target_prompt, negative_prompt)
        base_ctx = jnp.concatenate([bu, bc]) if do_cfg else bc
        tgt_ctx = jnp.concatenate([tu, tc]) if do_cfg else tc

        init = jnp.asarray(self.image_processor.preprocess(image))
        lat = self.vae.encode(init.astype(self.vae.dtype)).mode() \
            .astype(jnp.float32) * self.vae.config.scaling_factor

        state = self.scheduler.set_timesteps(num_inference_steps)
        t_limit = num_inference_steps - int(num_inference_steps * strength)
        a_all, b_all = self._coeffs(state, num_inference_steps)
        p = self.mixing_coeff
        leapfrog = self.leapfrog_steps
        n_act = num_inference_steps - t_limit
        unet, scheduler = self.unet, self.scheduler
        timesteps = state.timesteps

        def eps_at(params, model_input, t, ctx):
            lat_in = (jnp.concatenate([model_input, model_input])
                      if do_cfg else model_input)
            t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
            pred = unet.module.apply({"params": params},
                                     lat_in.astype(unet.dtype), t_in,
                                     ctx.astype(unet.dtype)).astype(jnp.float32)
            if do_cfg:
                un, co = jnp.split(pred, 2)
                pred = un + jnp.float32(guidance_scale) * (co - un)
            return pred

        def build():
            def run(params, lat, base_ctx, tgt_ctx):
                x0 = lat
                y0 = lat

                # ---- inversion (noise_step over reversed active schedule)
                def inv_body(s, carry):
                    x, y = carry
                    idx = num_inference_steps - 1 - s  # walk schedule tail up
                    t = timesteps[idx]
                    a_t, b_t = a_all[idx], b_all[idx]
                    # inverse mixing layer first
                    y = (y - (1 - p) * x) / p
                    x = (x - (1 - p) * y) / p

                    def one(k_first, x, y):
                        # k_first chooses which stream is 'base' first
                        def step(base, model_input):
                            eps = eps_at(params, model_input, t, base_ctx)
                            return (base - b_t * eps) / a_t

                        if k_first == 0:
                            x = step(x, y)
                            y = step(y, x)
                        else:
                            y = step(y, x)
                            x = step(x, y)
                        return x, y

                    if leapfrog:
                        x, y = jax.lax.cond(s % 2 == 1,
                                            lambda xy: one(1, *xy),
                                            lambda xy: one(0, *xy),
                                            (x, y))
                    else:
                        x, y = one(0, x, y)
                    return x, y

                x, y = jax.lax.fori_loop(0, n_act, inv_body, (x0, y0))

                # ---- denoise under the target prompt
                def den_body(s, carry):
                    x, y = carry
                    idx = t_limit + s
                    t = timesteps[idx]
                    a_t, b_t = a_all[idx], b_all[idx]

                    def one(k_first, x, y):
                        def step(base, model_input):
                            eps = eps_at(params, model_input, t, tgt_ctx)
                            return a_t * base + b_t * eps

                        if k_first == 0:
                            x = step(x, y)
                            y = step(y, x)
                        else:
                            y = step(y, x)
                            x = step(x, y)
                        return x, y

                    if leapfrog:
                        x, y = jax.lax.cond(s % 2 == 1,
                                            lambda xy: one(1, *xy),
                                            lambda xy: one(0, *xy),
                                            (x, y))
                    else:
                        x, y = one(0, x, y)
                    x = p * x + (1 - p) * y
                    y = p * y + (1 - p) * x
                    return x, y

                x, y = jax.lax.fori_loop(0, n_act, den_body, (x, y))
                return x

            return jax.jit(run)

        lat_out = self._jit.get(("edict", lat.shape, num_inference_steps,
                                 t_limit, do_cfg, float(guidance_scale)),
                                build)(
            self.unet.params, lat, base_ctx, tgt_ctx)
        if output_type == "latent":
            return (lat_out,)
        image_out = self._decode_latents(lat_out)
        return (self.image_processor.postprocess(image_out, output_type),)


# -------------------------------------------------------------------- FABRIC
@register_pipeline
class FabricPipeline(StableDiffusionPipeline):
    """FABRIC feedback-conditioned generation (reference
    examples/community/pipeline_fabric.py): liked/disliked images' noised
    latents run through the UNet at each step; their pre-attn1 hidden states
    extend the self-attention K/V — the cond branch attends to LIKED tokens
    with weight w_pos, the uncond branch to DISLIKED tokens with weight
    w_neg (logit bias log w == the reference's prob*w renormalization).
    Outside [feedback_start, feedback_end) the extra tokens are masked
    (bias -30), matching the reference's no-caching window."""

    def __call__(self, prompt, liked=None, disliked=None, height: int = 512,
                 width: int = 512, num_inference_steps: int = 25,
                 guidance_scale: float = 7.5, negative_prompt=None,
                 seed: int = 0, pos_weight: float = 0.8,
                 neg_weight: float = 0.5, feedback_start_ratio: float = 0.33,
                 feedback_end_ratio: float = 0.66,
                 output_type: str = "pil", **kwargs):
        from ..models.animate_anyone import _path_sort_key

        do_cfg = guidance_scale > 1.0
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        batch = cond.shape[0]
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor, self.unet.config.in_channels)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma

        def feedback_latents(images):
            if not images:
                return None
            arr = jnp.concatenate([
                jnp.asarray(self.image_processor.preprocess(im))
                for im in images])
            lat = self.vae.encode(arr.astype(self.vae.dtype)).mode() \
                .astype(jnp.float32) * self.vae.config.scaling_factor
            return lat

        pos_lat = feedback_latents(liked)
        neg_lat = feedback_latents(disliked)
        if pos_lat is None and neg_lat is None:
            return super().__call__(
                prompt, height=height, width=width,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                negative_prompt=negative_prompt, seed=seed,
                output_type=output_type)

        i_start = int(num_inference_steps * feedback_start_ratio)
        i_end = int(num_inference_steps * feedback_end_ratio)
        unet, scheduler = self.unet, self.scheduler
        null_ctx = uncond[:1]

        def capture_hiddens(params, lat, t, ctx):
            n = lat.shape[0]
            _, st = unet.module.apply(
                {"params": params}, lat.astype(unet.dtype),
                jnp.broadcast_to(t, (n,)),
                jnp.broadcast_to(ctx, (n, *ctx.shape[1:])).astype(unet.dtype),
                capture_intermediates=lambda m, _:
                    type(m).__name__ == "LayerNorm" and m.name == "norm1"
                    and any(str(p).startswith("transformer_blocks")
                            for p in m.path))
            flat = jax.tree_util.tree_flatten_with_path(
                st["intermediates"])[0]
            named = []
            for keypath, value in flat:
                path = tuple(getattr(k, "key", str(k)) for k in keypath)
                if "norm1" not in path:
                    continue
                named.append((tuple(p for p in path if p != "__call__"),
                              value))
            named.sort(key=lambda kv: _path_sort_key(kv[0]))
            # (n_imgs, tokens, d) -> (1, n_imgs*tokens, d) per block
            return [v.reshape(1, -1, v.shape[-1]) for _, v in named]

        def build():
            def denoise(params, latents, cond, uncond, pos_lat, neg_lat,
                        state, gs, key):
                def one_branch(lat_half, ctx, fb_lat, log_w, t, i, key):
                    if fb_lat is None:
                        pred = unet.module.apply(
                            {"params": params}, lat_half.astype(unet.dtype),
                            jnp.broadcast_to(t, (lat_half.shape[0],)),
                            ctx.astype(unet.dtype)).astype(jnp.float32)
                        return pred
                    noise = jax.random.normal(key, fb_lat.shape)
                    fb_t = scheduler.add_noise(fb_lat, noise,
                                               t[None].astype(jnp.int32))
                    refs = capture_hiddens(params, fb_t, t, null_ctx)
                    in_window = jnp.logical_and(i >= i_start, i < i_end)
                    lw = jnp.where(in_window, jnp.log(jnp.float32(log_w)),
                                   -30.0)
                    refs = [(jnp.repeat(r, lat_half.shape[0], axis=0), lw)
                            for r in refs]
                    return unet.module.apply(
                        {"params": params}, lat_half.astype(unet.dtype),
                        jnp.broadcast_to(t, (lat_half.shape[0],)),
                        ctx.astype(unet.dtype),
                        reference_features=refs).astype(jnp.float32)

                def body(i, carry):
                    latents, state, key = carry
                    key, kp, kn = jax.random.split(key, 3)
                    t = state.timesteps[i]
                    lat_in = scheduler.scale_model_input(state, latents, i)
                    eps_c = one_branch(lat_in, cond, pos_lat, pos_weight,
                                       t, i, kp)
                    if do_cfg:
                        eps_u = one_branch(lat_in, uncond, neg_lat,
                                           neg_weight, t, i, kn)
                        pred = eps_u + gs * (eps_c - eps_u)
                    else:
                        pred = eps_c
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (latents, state, key))
                return out

            return jax.jit(denoise, static_argnums=())

        n_pos = None if pos_lat is None else pos_lat.shape[0]
        n_neg = None if neg_lat is None else neg_lat.shape[0]
        latents = self._jit.get(
            ("fabric", shape, num_inference_steps, do_cfg, n_pos, n_neg,
             pos_weight, neg_weight, i_start, i_end), build)(
            self.unet.params, latents, cond, uncond, pos_lat, neg_lat,
            state, jnp.asarray(guidance_scale, jnp.float32),
            jax.random.PRNGKey(seed + 1))
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)


@register_pipeline
class CLIPGuidedImagesMixingPipeline(CLIPGuidedStableDiffusionPipeline):
    """Content/style image mixing under CLIP guidance (reference
    examples/community/clip_guided_images_mixing_stable_diffusion.py):
    slerp the two images' VAE latents and their prompts' embeddings, start
    the denoise from the noised mixed latent, and steer each step toward
    the slerped CLIP image target."""

    def images_mixing(self, content_image, style_image,
                      content_prompt: str = "", style_prompt: str = "",
                      latent_style_strength: float = 0.8,
                      prompt_style_strength: float = 0.1,
                      clip_style_strength: float = 0.1,
                      noise_strength: float = 0.6,
                      clip_guidance_scale: float = 100.0,
                      num_inference_steps: int = 25,
                      guidance_scale: float = 7.5, seed: int = 0,
                      output_type: str = "pil"):
        do_cfg = guidance_scale > 1.0
        c_cond, uncond = self.encode_prompt(content_prompt)
        s_cond, _ = self.encode_prompt(style_prompt)
        cond = slerp(prompt_style_strength, c_cond, s_cond)
        context = jnp.concatenate([uncond, cond]) if do_cfg else cond

        def to_latent(im):
            arr = jnp.asarray(self.image_processor.preprocess(im))
            return self.vae.encode(arr.astype(self.vae.dtype)).mode() \
                .astype(jnp.float32) * self.vae.config.scaling_factor

        lat = slerp(latent_style_strength, to_latent(content_image),
                    to_latent(style_image))

        # CLIP image-feature target = slerp of the two images' features
        clip = self.clip_model
        vc = getattr(clip.config, "vision_config", None) or {}
        img_size = (vc.get("image_size", 224) if isinstance(vc, dict)
                    else getattr(vc, "image_size", 224))

        def clip_feat(im):
            arr = jnp.asarray(self.image_processor.preprocess(im))
            arr = jax.image.resize(
                (arr + 1.0) / 2.0,
                (arr.shape[0], img_size, img_size, arr.shape[-1]),
                method="bilinear")
            f = clip.encode_image(arr)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        target = slerp(clip_style_strength, clip_feat(content_image),
                       clip_feat(style_image))
        target = target / jnp.linalg.norm(target, axis=-1, keepdims=True)

        state = self.scheduler.set_timesteps(num_inference_steps)
        t_start = max(num_inference_steps
                      - int(num_inference_steps * noise_strength), 0)
        noise = jax.random.normal(jax.random.PRNGKey(seed), lat.shape,
                                  jnp.float32)
        t0 = state.timesteps[t_start].astype(jnp.int32)
        if hasattr(state, "sigmas"):
            latents = lat + state.sigmas[t_start] * noise
        else:
            latents = self.scheduler.add_noise(lat, noise, t0[None])

        unet, scheduler, vae = self.unet, self.scheduler, self.vae
        alphas_bar = self.scheduler.alphas_cumprod

        def build():
            def denoise(unet_params, vae_params, clip_params, latents,
                        context, state, gs, cgs, target):
                def clip_loss(latv, eps, t_idx):
                    ab = alphas_bar[state.timesteps[t_idx]]
                    x0 = (latv - jnp.sqrt(1 - ab) * eps) / jnp.sqrt(ab)
                    img = vae.module.apply(
                        {"params": vae_params},
                        (x0 / vae.config.scaling_factor).astype(vae.dtype),
                        method=vae.module.decode).astype(jnp.float32)
                    img = jax.image.resize(
                        img, (img.shape[0], img_size, img_size,
                              img.shape[-1]), method="bilinear")
                    img = (img + 1.0) / 2.0
                    feat = clip.module.apply({"params": clip_params}, img,
                                             method=clip.module.encode_image)
                    feat = feat / jnp.linalg.norm(feat, axis=-1,
                                                  keepdims=True)
                    return -jnp.sum(feat * target)

                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = (jnp.concatenate([latents, latents])
                              if do_cfg else latents)
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    t_in = jnp.broadcast_to(t, (lat_in.shape[0],))
                    pred = unet.module.apply(
                        {"params": unet_params}, lat_in.astype(unet.dtype),
                        t_in, context.astype(unet.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    g = jax.grad(clip_loss)(latents, pred, i)
                    pred = pred + cgs * g
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(t_start, num_inference_steps,
                                           body, (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(
            ("imgmix", lat.shape, num_inference_steps, t_start, do_cfg),
            build)(self.unet.params, self.vae.params, clip.params, latents,
                   context, state, jnp.asarray(guidance_scale, jnp.float32),
                   jnp.asarray(clip_guidance_scale, jnp.float32), target)
        if output_type == "latent":
            return (latents,)
        image = self._decode_latents(latents)
        return (self.image_processor.postprocess(image, output_type),)
