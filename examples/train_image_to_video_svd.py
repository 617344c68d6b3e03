"""Stable Video Diffusion image-to-video fine-tuning (reference
ppdiffusers/examples/stable_video_diffusion/train_image_to_video_svd.py):
EDM-preconditioned v-objective on video latents, conditioned on the first
frame three ways — CLIP image embedding as cross-attention context, a
noise-augmented copy of the first-frame latent concatenated to every
frame's channels, and added_time_ids = (fps-1, motion_bucket_id,
noise_aug_strength) — with classifier-free conditioning dropout.

sigma ~ LogNormal(P_mean, P_std) (the reference's rand_log_normal);
c_skip = 1/(sigma^2+1), c_out = -sigma/sqrt(sigma^2+1), c_in =
1/sqrt(sigma^2+1), loss weight (1+sigma^2)/sigma^2 on the denoised
prediction vs the clean latents.

Offline-friendly: synthetic video latents + image embeddings by default;
pass --data prefix for real precomputed features
(<prefix>_latents.npy (N,F,H,W,4), <prefix>_embeds.npy (N,D)).

Usage:
    python examples/train_image_to_video_svd.py --steps 100 --frames 4
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models import (
    UNetSpatioTemporalConditionConfig,
    UNetSpatioTemporalConditionModel,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--latent-size", type=int, default=8)
    ap.add_argument("--base-channels", type=int, default=32)
    ap.add_argument("--cross-dim", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--p-mean", type=float, default=0.7)
    ap.add_argument("--p-std", type=float, default=1.6)
    ap.add_argument("--cond-dropout", type=float, default=0.1)
    ap.add_argument("--noise-aug", type=float, default=0.02)
    ap.add_argument("--motion-bucket", type=int, default=127)
    ap.add_argument("--fps", type=int, default=7)
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--output", type=str, default="svd_unet_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    c = args.base_channels
    cfg = UNetSpatioTemporalConditionConfig(
        in_channels=8, out_channels=4,
        block_out_channels=(c, c * 2, c * 2, c * 2),
        cross_attention_dim=args.cross_dim,
        num_attention_heads=(2, 4, 4, 4),
        layers_per_block=1, norm_num_groups=8,
        addition_time_embed_dim=8,
        num_frames=args.frames)
    unet = UNetSpatioTemporalConditionModel.from_config(cfg)

    tx = optax.adamw(args.lr, weight_decay=1e-2)
    params = unet.params
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    if args.data:
        latents = np.load(args.data + "_latents.npy").astype(np.float32)
        embeds = np.load(args.data + "_embeds.npy").astype(np.float32)
    else:
        latents = embeds = None

    def batch():
        if latents is None:
            z = host.normal(size=(args.batch, args.frames, args.latent_size,
                                  args.latent_size, 4)).astype(np.float32)
            e = host.normal(size=(args.batch, 1,
                                  args.cross_dim)).astype(np.float32)
            return z, e
        idx = host.integers(0, len(latents), args.batch)
        return latents[idx, : args.frames], embeds[idx][:, None, :]

    add_ids = jnp.asarray(
        [[args.fps - 1, args.motion_bucket, args.noise_aug]], jnp.float32)
    add_ids = jnp.repeat(add_ids, args.batch, axis=0)

    @jax.jit
    def step(params, opt_state, key, z0, image_embeds):
        ks, kn, ka, kd = jax.random.split(key, 4)
        b = z0.shape[0]
        # EDM sigma ~ exp(N(P_mean, P_std)) per sample
        sigma = jnp.exp(args.p_mean
                        + args.p_std * jax.random.normal(ks, (b,)))
        s = sigma[:, None, None, None, None]
        noise = jax.random.normal(kn, z0.shape)
        noisy = z0 + s * noise

        c_skip = 1.0 / (s ** 2 + 1.0)
        c_out = -s / jnp.sqrt(s ** 2 + 1.0)
        c_in = 1.0 / jnp.sqrt(s ** 2 + 1.0)
        # the reference feeds 0.25*log(sigma) as the timestep
        t_cond = 0.25 * jnp.log(sigma)

        # conditioning: noise-augmented first-frame latent, every frame
        first = z0[:, :1] + args.noise_aug * jax.random.normal(ka, z0[:, :1].shape)
        first = jnp.repeat(first, z0.shape[1], axis=1)
        # classifier-free dropout zeroes both conditionings together
        keep = (jax.random.uniform(kd, (b, 1, 1, 1, 1))
                >= args.cond_dropout).astype(z0.dtype)
        first = first * keep
        image_embeds = image_embeds * keep[:, :, 0, 0, :]

        model_in = jnp.concatenate([c_in * noisy, first], axis=-1)

        def loss_fn(p):
            out = unet.module.apply({"params": p}, model_in, t_cond,
                                    image_embeds, add_ids)
            denoised = c_skip * noisy + c_out * out
            w = (1.0 + sigma ** 2) / sigma ** 2
            return jnp.mean(w[:, None, None, None, None]
                            * jnp.square(denoised - z0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        z, e = batch()
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(z), jnp.asarray(e))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    unet.params = params
    unet.save_pretrained(args.output)
    print(f"saved svd unet -> {args.output}")


if __name__ == "__main__":
    main()
