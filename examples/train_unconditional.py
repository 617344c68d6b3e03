"""Unconditional image-generation training (reference ppdiffusers/examples/
unconditional_image_generation/train_unconditional.py): DDPM epsilon
prediction on pixel-space images with a plain (no cross-attention) UNet,
EMA weights, and a DDPMPipeline saved at the end.

Offline-friendly: synthetic two-mode images by default.

Usage:
    python examples/train_unconditional.py --steps 200
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def synthetic_images(rng, n, res):
    """Two modes: bright circle or dark stripe — enough structure for the
    loss to fall below the unconditional-noise floor."""
    img = np.zeros((n, res, res, 3), np.float32)
    yy, xx = np.mgrid[0:res, 0:res]
    for i in range(n):
        if rng.random() < 0.5:
            cx, cy = rng.integers(res // 4, 3 * res // 4, 2)
            img[i] = ((xx - cx) ** 2 + (yy - cy) ** 2 < (res // 4) ** 2
                      )[..., None] * 0.8
        else:
            s = int(rng.integers(0, res // 2))
            img[i, s:s + res // 4] = 0.3
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--resolution", type=int, default=16)
    ap.add_argument("--ema-decay", type=float, default=0.995)
    ap.add_argument("--output", type=str, default="ddpm_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import (UNet2DConditionConfig,
                                                UNet2DConditionModel)
    from paddlemix_tpu.trainer.ema import ema_init, ema_update

    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig(
        sample_size=args.resolution, in_channels=3, out_channels=3,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=8), seed=args.seed)
    sched = DDPMScheduler()
    ema = ema_init(unet.params)
    from paddlemix_tpu.diffusers.pipelines.unconditional import _dummy_context

    tx = optax.adamw(args.lr, weight_decay=1e-2)
    opt_state = tx.init(unet.params)
    n_train = sched.config.num_train_timesteps

    @jax.jit
    def step(params, opt_state, key, images):
        def loss_fn(p):
            kt, kn = jax.random.split(key)
            x = images * 2 - 1
            t = jax.random.randint(kt, (x.shape[0],), 0, n_train)
            noise = jax.random.normal(kn, x.shape)
            noisy = sched.add_noise(x, noise, t)
            pred = unet.module.apply({"params": p}, noisy.astype(unet.dtype),
                                     t.astype(jnp.float32),
                                     _dummy_context(unet, x.shape[0])
                                     ).astype(jnp.float32)
            return jnp.mean((pred - noise) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        unet.params, opt_state, loss = step(
            unet.params, opt_state, sub,
            jnp.asarray(synthetic_images(rng, args.batch, args.resolution)))
        ema = ema_update(ema, unet.params, decay=args.ema_decay)
        if it % 25 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    unet.params = ema.params
    from paddlemix_tpu.diffusers.pipelines import DDPMPipeline

    pipe = DDPMPipeline(unet=unet, scheduler=sched)
    pipe.save_pretrained(args.output)
    print(f"saved DDPM pipeline -> {args.output}")


if __name__ == "__main__":
    main()
