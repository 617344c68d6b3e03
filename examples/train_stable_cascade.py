"""Stable Cascade stage-C training (reference ppdiffusers/examples/
stable_cascade/train_stage_c_trainer.py): epsilon prediction on
EfficientNet latents under the Wuerstchen continuous-time cosine schedule,
conditioned on CLIP text states + pooled text + image embeddings, with
p2-style loss weighting (reference GDF AdaptiveLossWeight simplified to
1/(1-alpha_cumprod) clipped).

Offline-friendly: synthetic effnet latents + CLIP embeddings by default.

Usage:
    python examples/train_stable_cascade.py --steps 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models import (
    StableCascadeUNet,
    StableCascadeUNetConfig,
)
from paddlemix_tpu.diffusers.schedulers import DDPMWuerstchenScheduler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--latent-size", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--clip-dim", type=int, default=32)
    ap.add_argument("--text-len", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--output", type=str, default="cascade_c_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    c = args.hidden
    cfg = StableCascadeUNetConfig(
        c_in=16, c_out=16, c_r=16, patch_size=1, c_cond=c,
        c_hidden=(c, c), nhead=(2, 2), blocks_down=(1, 1), blocks_up=(1, 1),
        level_config=("CTA", "CTA"),
        c_clip_text=args.clip_dim, c_clip_text_pooled=args.clip_dim,
        c_clip_img=args.clip_dim, c_clip_seq=2)
    unet = StableCascadeUNet.from_config(cfg)
    sched = DDPMWuerstchenScheduler()

    tx = optax.adamw(args.lr, weight_decay=1e-2)
    params = unet.params
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    @jax.jit
    def step(params, opt_state, key, x0, text, pooled, img_emb):
        kt, kn = jax.random.split(key)
        b = x0.shape[0]
        # continuous time t ~ U(0,1); cosine alpha_cumprod (reference GDF
        # CosineSchedule)
        t = jax.random.uniform(kt, (b,), minval=1e-4, maxval=1.0)
        acp = sched._alpha_cumprod(t)[:, None, None, None]
        noise = jax.random.normal(kn, x0.shape)
        noisy = jnp.sqrt(acp) * x0 + jnp.sqrt(1 - acp) * noise
        w = jnp.clip(1.0 / (1.0 - acp[:, 0, 0, 0]), 0.0, 5.0)  # p2-ish

        def loss_fn(p):
            pred = unet.module.apply({"params": p}, noisy, t,
                                     clip_text=text, clip_text_pooled=pooled,
                                     clip_img=img_emb)
            per = jnp.mean(jnp.square(pred - noise), axis=(1, 2, 3))
            return jnp.mean(w * per)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        x0 = host.normal(size=(args.batch, args.latent_size,
                               args.latent_size, 16)).astype(np.float32)
        text = host.normal(size=(args.batch, args.text_len,
                                 args.clip_dim)).astype(np.float32)
        pooled = host.normal(size=(args.batch,
                                   args.clip_dim)).astype(np.float32)
        img_emb = host.normal(size=(args.batch,
                                    args.clip_dim)).astype(np.float32)
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(x0), jnp.asarray(text),
                                       jnp.asarray(pooled),
                                       jnp.asarray(img_emb))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    unet.params = params
    unet.save_pretrained(args.output)
    print(f"saved stage-c unet -> {args.output}")


if __name__ == "__main__":
    main()
