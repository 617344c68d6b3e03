"""U-ViT text-to-image latent-diffusion training (reference
ppdiffusers/examples/text_to_image_mscoco_uvit/
train_txt2img_mscoco_uvit_trainer.py over ldm/uvit_t2i.py).

Epsilon-prediction DDPM objective on latents. Offline-friendly: synthetic
latent/text-embedding pairs by default; pass --data latents.npy/texts.npy
for real precomputed MS-COCO latents + CLIP states (the reference trains
from precomputed feature files the same way).

Usage:
    python examples/train_uvit_t2i.py --steps 200 --sample-size 16 --depth 4
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models.uvit_t2i import UViTT2IConfig, UViTT2IModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample-size", type=int, default=16)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--head-dim", type=int, default=16)
    ap.add_argument("--clip-dim", type=int, default=32)
    ap.add_argument("--text-tokens", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--num-train-timesteps", type=int, default=1000)
    ap.add_argument("--data", type=str, default=None,
                    help="prefix: <data>_latents.npy (N,H,W,4) + "
                         "<data>_text.npy (N,T,clip_dim)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = UViTT2IConfig(
        sample_size=args.sample_size, patch_size=2, in_channels=4,
        out_channels=4, num_layers=args.depth,
        num_attention_heads=args.heads, attention_head_dim=args.head_dim,
        clip_dim=args.clip_dim, num_text_tokens=args.text_tokens)
    model = UViTT2IModel.from_config(cfg)

    # linear beta DDPM schedule (reference config scheduler)
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5,
                        args.num_train_timesteps) ** 2
    alphas_bar = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)

    tx = optax.adamw(args.lr, weight_decay=0.03)
    params = model.params
    opt_state = tx.init(params)

    if args.data:
        latents = np.load(args.data + "_latents.npy").astype(np.float32)
        texts = np.load(args.data + "_text.npy").astype(np.float32)
    else:
        latents = texts = None
    host = np.random.default_rng(args.seed)

    def batch():
        if latents is None:
            z = host.normal(size=(args.batch, args.sample_size,
                                  args.sample_size, 4)).astype(np.float32)
            c = host.normal(size=(args.batch, args.text_tokens,
                                  args.clip_dim)).astype(np.float32)
            return z, c
        idx = host.integers(0, len(latents), args.batch)
        return latents[idx], texts[idx]

    @jax.jit
    def step(params, opt_state, key, z0, context):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (z0.shape[0],), 0,
                               args.num_train_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        ab = alphas_bar[t][:, None, None, None]
        zt = jnp.sqrt(ab) * z0 + jnp.sqrt(1 - ab) * noise

        def loss_fn(p):
            pred = model.module.apply({"params": p}, zt, t, context)
            return jnp.mean(jnp.square(pred - noise))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        z0, ctx = batch()
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(z0), jnp.asarray(ctx))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
