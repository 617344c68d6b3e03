"""Diffusion training utilities (reference ppdiffusers/training_utils.py:
compute_snr :45, EMAModel -> trainer/ema.py, cast_training_params) plus the
standard SD denoising loss used by the reference training examples
(examples/text_to_image/train_text_to_image_sdxl.py:999 epoch loop)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def compute_snr(alphas_cumprod, timesteps):
    """SNR(t) = alpha^2 / sigma^2 (reference training_utils.py:45)."""
    a = alphas_cumprod[timesteps]
    return a / (1.0 - a)


def snr_weights(alphas_cumprod, timesteps, snr_gamma: float = 5.0,
                prediction_type: str = "epsilon"):
    """Min-SNR-gamma loss weights (reference SDXL trainer --snr_gamma)."""
    snr = compute_snr(alphas_cumprod, timesteps)
    w = jnp.minimum(snr, snr_gamma)
    if prediction_type == "epsilon":
        w = w / jnp.maximum(snr, 1e-8)
    elif prediction_type == "v_prediction":
        w = w / (snr + 1.0)
    return w


def make_sd_loss_fn(unet, scheduler, *, prediction_type: str = "epsilon",
                    snr_gamma: Optional[float] = None,
                    added_cond_fn: Optional[Callable] = None):
    """Build loss_fn(params, batch, rng) for UNet training.

    batch: {"latents": (B,h,w,4) VAE latents (pre-scaled),
            "encoder_hidden_states": (B,S,D), optional added-cond tensors}.
    Timestep sampling + noising happen inside the jitted step (the reference
    does this in the python epoch loop)."""
    num_train = scheduler.config.num_train_timesteps
    acp = scheduler.alphas_cumprod

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, num_train)
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        noisy = scheduler.add_noise(latents, noise, t)
        kwargs = {}
        if added_cond_fn is not None:
            kwargs["added_cond_kwargs"] = added_cond_fn(batch)
        pred = unet.module.apply({"params": params}, noisy.astype(unet.dtype), t,
                                 batch["encoder_hidden_states"].astype(unet.dtype),
                                 **kwargs).astype(jnp.float32)
        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = scheduler.get_velocity(latents, noise, t)
        else:
            target = latents
        per_ex = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
        if snr_gamma is not None:
            per_ex = per_ex * snr_weights(acp, t, snr_gamma, prediction_type)
        return jnp.mean(per_ex)

    return loss_fn


def make_flow_match_loss_fn(transformer, scheduler, *, shift: float = 3.0):
    """SD3 flow-matching loss (reference examples/.../sd3 trainer):
    x_t = (1-sigma) x0 + sigma noise; target velocity = noise - x0."""

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        u = jax.random.uniform(rng_t, (b,))
        sigma = shift * u / (1.0 + (shift - 1.0) * u)
        t = sigma * scheduler.config.num_train_timesteps
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        s = sigma[:, None, None, None]
        noisy = (1.0 - s) * latents + s * noise
        pred = transformer.module.apply(
            {"params": params}, noisy.astype(transformer.dtype), t,
            batch["encoder_hidden_states"].astype(transformer.dtype),
            batch["pooled_projections"].astype(transformer.dtype)).astype(jnp.float32)
        target = noise - latents
        return jnp.mean((pred - target) ** 2)

    return loss_fn


def cast_training_params(params, dtype=jnp.float32):
    """Keep trainable params in fp32 while the model computes in bf16
    (reference cast_training_params)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
