"""Shap-E text-to-3D (reference ppdiffusers/pipelines/shap_e/: renderer.py,
camera.py, pipeline_shap_e.py): a prior transformer denoises 1024x1024 latent
tokens conditioned on the CLIP text embedding; the latents are projected into
the first MLP layers of a NeRF field (params-proj), which is then volume-
rendered from a 20-view camera orbit.

All rendering is pure jax (static ray/sample counts): bounding-box slab
intersection, stratified coarse pass, importance-weighted fine pass, standard
alpha-compositing transmittance integration."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ..models.embeddings import TimestepEmbedding, Timesteps
from ..models.prior_transformer import PriorBlock
from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


# ------------------------------------------------------------------ posenc
def posenc_nerf(x, min_deg=0, max_deg=15):
    if min_deg == max_deg:
        return x
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    emb = jnp.sin(jnp.concatenate([xb, xb + math.pi / 2.0], axis=-1))
    return jnp.concatenate([x, emb], axis=-1)


def encode_position(p):
    return posenc_nerf(p, 0, 15)


def encode_direction(p, direction=None):
    if direction is None:
        return jnp.zeros((*p.shape[:-1], posenc_nerf(p[..., :3], 0, 8).shape[-1]),
                         p.dtype)
    return posenc_nerf(direction, 0, 8)


# ----------------------------------------------------------------- latents
@dataclasses.dataclass
class ShapEPriorConfig(BaseConfig):
    model_type = "shap-e-prior"
    num_latent_tokens: int = 1024
    d_latent: int = 1024
    num_attention_heads: int = 16
    attention_head_dim: int = 64
    num_layers: int = 24
    clip_embed_dim: int = 768


class ShapEPriorModule(nn.Module):
    """Prior over latent TOKENS (unlike the single-vector unCLIP prior):
    sequence = [time, projected clip embed, latent tokens]."""

    config: ShapEPriorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timestep, clip_embed):
        cfg = self.config
        d = cfg.num_attention_heads * cfg.attention_head_dim
        b, n, _ = latents.shape
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        t = Timesteps(d, flip_sin_to_cos=True, downscale_freq_shift=0.0)(timestep)
        t = TimestepEmbedding(d, dtype=self.dtype, name="time_embedding")(
            t.astype(self.dtype))
        c = nn.Dense(d, dtype=self.dtype, name="clip_proj")(clip_embed)
        x = nn.Dense(d, dtype=self.dtype, name="proj_in")(latents)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n + 2, d))
        seq = jnp.concatenate([t[:, None], c[:, None], x], axis=1) + \
            pos.astype(self.dtype)
        for i in range(cfg.num_layers):
            seq = PriorBlock(cfg.num_attention_heads, cfg.attention_head_dim,
                             dtype=self.dtype, name=f"blocks_{i}")(seq)
        seq = nn.LayerNorm(dtype=self.dtype, name="norm_out")(seq)
        return nn.Dense(cfg.d_latent, dtype=self.dtype, name="proj_out")(seq[:, 2:])


class ShapEPrior(PretrainedModel):
    config_class = ShapEPriorConfig
    module_class = ShapEPriorModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, config.num_latent_tokens, config.d_latent)),
                 jnp.zeros(()), jnp.zeros((1, config.clip_embed_dim))), {})


# ---------------------------------------------------------------- renderer
@dataclasses.dataclass
class ShapERendererConfig(BaseConfig):
    model_type = "shap-e-renderer"
    d_latent: int = 1024
    d_hidden: int = 256
    n_output: int = 12
    n_hidden_layers: int = 6
    insert_direction_at: int = 4
    n_projected_layers: int = 4  # MLP layers whose weights come from latents
    background: Tuple[float, ...] = (255.0, 255.0, 255.0)


class ShapERendererModule(nn.Module):
    """ChannelsProj (latents -> first MLP weights) + the MLP NeRF field
    (renderer.py MLPNeRSTFModel + ShapEParamsProjModel)."""

    config: ShapERendererConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        d_pos = 3 + 3 * 2 * 15  # 93
        d_dir = 3 + 3 * 2 * 8   # 51
        widths_in = [d_pos] + [cfg.d_hidden] * cfg.n_hidden_layers
        widths_out = [cfg.d_hidden] * cfg.n_hidden_layers + [cfg.n_output]
        widths_in[cfg.insert_direction_at] += d_dir
        self._widths = (tuple(widths_in), tuple(widths_out))
        projs, norms, biases = [], [], []
        for i in range(cfg.n_projected_layers):
            projs.append(self.param(f"proj_{i}", nn.initializers.normal(0.02),
                                    (cfg.d_latent, widths_in[i])))
            norms.append((self.param(f"norm_scale_{i}", nn.initializers.ones,
                                     (widths_in[i],)),
                          self.param(f"norm_bias_{i}", nn.initializers.zeros,
                                     (widths_in[i],))))
            biases.append(self.param(f"proj_bias_{i}", nn.initializers.zeros,
                                     (cfg.d_hidden, widths_in[i])))
        self._projs, self._norms, self._proj_biases = projs, norms, biases
        self.base_kernels = [
            self.param(f"mlp_{i}_kernel", nn.initializers.lecun_normal(),
                       (widths_in[i], widths_out[i]))
            for i in range(cfg.n_projected_layers, cfg.n_hidden_layers + 1)]
        self.base_biases = [
            self.param(f"mlp_{i}_bias", nn.initializers.zeros, (widths_out[i],))
            for i in range(cfg.n_hidden_layers + 1)]

    def project_params(self, latents):
        """latents (n_tokens, d_latent) -> per-layer kernels (in, out).
        Each projected layer consumes d_hidden=256 latent tokens
        (ShapEParamsProjModel: einsum + LayerNorm + bias, renderer.py:652)."""
        cfg = self.config
        kernels = []
        start = 0
        for i in range(cfg.n_projected_layers):
            vecs = cfg.d_hidden  # 256 rows per projected weight
            x = latents[start:start + vecs]  # (vecs, d_latent)
            h = x @ self._projs[i]  # (vecs, in_width)
            mean = h.mean(-1, keepdims=True)
            var = h.var(-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            h = h * self._norms[i][0] + self._norms[i][1] + self._proj_biases[i]
            kernels.append(h.T)  # torch weight (out, in) -> kernel (in, out)
            start += vecs
        return kernels

    def field(self, latents, position, direction=None, fine=False):
        """Evaluate density + rgb at positions. position: (..., 3)."""
        cfg = self.config
        kernels = self.project_params(latents)
        kernels = kernels + list(self.base_kernels)
        h = encode_position(position)
        for i in range(cfg.n_hidden_layers + 1):
            if i == cfg.insert_direction_at:
                h = jnp.concatenate(
                    [h, encode_direction(position, direction)], axis=-1)
            h = h @ kernels[i] + self.base_biases[i]
            if i < cfg.n_hidden_layers:
                h = nn.silu(h)
        density = nn.relu(h[..., 2:3] if fine else h[..., 1:2])
        rgb = nn.sigmoid(h[..., 9:12] if fine else h[..., 6:9])
        return density, rgb

    def __call__(self, latents, position, direction=None, fine=False):
        return self.field(latents, position, direction, fine)


class ShapERenderer(PretrainedModel):
    config_class = ShapERendererConfig
    module_class = ShapERendererModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((config.d_hidden * config.n_projected_layers,
                            config.d_latent)), jnp.zeros((4, 3))), {})

    # -------------------------------------------------------------- render
    def decode_to_image(self, latents, size: int = 64, n_views: int = 20,
                        n_coarse: int = 32, n_fine: int = 64, seed: int = 0):
        """latents: (n_tokens, d_latent) -> (n_views, size, size, 3) uint8-ish
        float images in [0, 1]."""
        origins, dirs = _pan_camera_rays(size, n_views)
        bg = jnp.asarray(self.config.background, jnp.float32) / 255.0

        def render(params, latents, origins, dirs, key):
            def eval_field(pos, drt, fine):
                return self.module.apply({"params": params}, latents, pos, drt,
                                         fine, method=self.module_class.field)

            t0, t1, hit = _bbox_intersect(origins, dirs)
            # coarse: stratified samples
            u = (jnp.arange(n_coarse, dtype=jnp.float32) + 0.5) / n_coarse
            ts = t0[..., None] + (t1 - t0)[..., None] * u  # (R, n)
            pos = origins[:, None] + ts[..., None] * dirs[:, None]
            den, rgb = eval_field(pos, None, False)
            w, _, _ = _integrate(ts, den[..., 0])
            # fine: importance resample from coarse weights
            key = jax.random.fold_in(key, 1)
            idx = jax.random.categorical(
                key, jnp.log(w + 1e-8), axis=-1,
                shape=(n_fine, *w.shape[:-1])).T  # (R, n_fine)
            jitter = jax.random.uniform(jax.random.fold_in(key, 2), idx.shape,
                                        minval=-0.5, maxval=0.5)
            dt = (t1 - t0)[..., None] / n_coarse
            ts_f = jnp.take_along_axis(ts, idx, axis=-1) + jitter * dt
            ts_all = jnp.sort(jnp.concatenate([ts, ts_f], axis=-1), axis=-1)
            pos = origins[:, None] + ts_all[..., None] * dirs[:, None]
            den, rgb = eval_field(pos, None, True)
            w, trans, _ = _integrate(ts_all, den[..., 0])
            color = jnp.einsum("rn,rnc->rc", w, rgb)
            color = color + trans[..., None] * bg
            return jnp.where(hit[..., None], color, bg[None])

        out = jax.jit(render)(self.params, latents, origins, dirs,
                              jax.random.PRNGKey(seed))
        return np.asarray(out.reshape(n_views, size, size, 3))


def _pan_camera_rays(size: int, n_views: int):
    """camera.py create_pan_cameras: orbit at radius 4, fov ~0.7 rad."""
    thetas = np.linspace(0, 2 * np.pi, num=n_views)
    fov = np.deg2rad(69.0)
    origins, dirs = [], []
    ii, jj = np.meshgrid(np.arange(size), np.arange(size), indexing="xy")
    fr = np.stack([ii, jj], -1).reshape(-1, 2).astype(np.float32)
    fr = (fr / (size - 1) * 2 - 1) * np.tan(fov / 2)
    for th in thetas:
        z = np.array([np.sin(th), np.cos(th), -0.5])
        z /= np.linalg.norm(z)
        origin = -z * 4
        x = np.array([np.cos(th), -np.sin(th), 0.0])
        y = np.cross(z, x)
        d = z[None] + x[None] * fr[:, :1] + y[None] * fr[:, 1:]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        origins.append(np.broadcast_to(origin, d.shape))
        dirs.append(d)
    return (jnp.asarray(np.concatenate(origins), jnp.float32),
            jnp.asarray(np.concatenate(dirs), jnp.float32))


def _bbox_intersect(origins, dirs, lo=-1.0, hi=1.0):
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
    ta = (lo - origins) * inv
    tb = (hi - origins) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    hit = t1 > jnp.maximum(t0, 0.0)
    t0 = jnp.maximum(t0, 0.0)
    return jnp.where(hit, t0, 0.0), jnp.where(hit, t1, 1.0), hit


def _integrate(ts, density):
    """Alpha compositing: returns per-sample weights, final transmittance."""
    deltas = jnp.diff(ts, axis=-1, append=ts[..., -1:] + 1e-3)
    alpha = 1.0 - jnp.exp(-density * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-8, axis=-1)
    trans_excl = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                                  trans[..., :-1]], axis=-1)
    weights = alpha * trans_excl
    return weights, trans[..., -1], alpha


@register_pipeline
class ShapEPipeline(DiffusionPipeline):
    def __init__(self, prior, text_encoder, tokenizer, scheduler, shap_e_renderer):
        self.register_modules(prior=prior, text_encoder=text_encoder,
                              tokenizer=tokenizer, scheduler=scheduler,
                              shap_e_renderer=shap_e_renderer)
        self._jit = _JitCache()

    def __call__(self, prompt, num_inference_steps: int = 25,
                 guidance_scale: float = 15.0, frame_size: int = 64,
                 n_views: int = 8, seed: int = 0, output_type: str = "np"):
        if isinstance(prompt, str):
            prompt = [prompt]
        do_cfg = guidance_scale > 1.0
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])
        out = self.text_encoder(ids)
        clip_embed = out[1] if isinstance(out, tuple) else out
        if do_cfg:
            clip_embed = jnp.concatenate([jnp.zeros_like(clip_embed), clip_embed])

        cfg = self.prior.config
        b = len(prompt)
        shape = (b, cfg.num_latent_tokens, cfg.d_latent)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * self.scheduler.init_noise_sigma
        prior, scheduler = self.prior, self.scheduler

        def build():
            def denoise(params, latents, clip_embed, state, gs):
                def body(i, carry):
                    latents, state = carry
                    t = state.timesteps[i]
                    lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
                    lat_in = scheduler.scale_model_input(state, lat_in, i)
                    pred = prior.module.apply(
                        {"params": params}, lat_in.astype(prior.dtype), t,
                        clip_embed.astype(prior.dtype)).astype(jnp.float32)
                    if do_cfg:
                        un, co = jnp.split(pred, 2)
                        pred = un + gs * (co - un)
                    latents, state = scheduler.step(state, pred, i, latents)
                    return latents, state

                out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                           (latents, state))
                return out

            return jax.jit(denoise)

        latents = self._jit.get(("shap_e", shape, num_inference_steps, do_cfg),
                                build)(prior.params, latents, clip_embed, state,
                                       jnp.asarray(guidance_scale, jnp.float32))
        if output_type == "latent":
            return (latents,)
        images = [self.shap_e_renderer.decode_to_image(
            latents[i], size=frame_size, n_views=n_views, seed=seed)
            for i in range(b)]
        return (np.stack(images),)
