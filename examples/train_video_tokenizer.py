"""MAGVIT-v2 video tokenizer training (reference ppdiffusers/examples/
video_tokenizer/magvit2/example.py + the VideoTokenizer GAN losses,
magvit2.py:1201-1372).

Reconstruction + LFQ entropy/commit aux losses, with an optional per-frame
hinge-GAN phase (generator and discriminator alternate inside one jitted
step). Runs on synthetic moving-square clips so it works offline; point
``--data`` at an .npy of (N, T, H, W, 3) uint8 clips for real data.

Usage:
    python examples/train_video_tokenizer.py --steps 100 --image-size 64 \
        --frames 17 --gan-after 50
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models import (
    FrameDiscriminator,
    VideoTokenizer,
    hinge_d_loss,
    hinge_g_loss,
)

LAYERS = (
    "residual",
    "compress_space",
    ("consecutive_residual", 2),
    "linear_attend_space",
    "compress_space",
    ("consecutive_residual", 2),
    "attend_space",
    "compress_time",
    ("consecutive_residual", 2),
    "attend_time",
)


def synthetic_batch(rng: np.random.Generator, batch: int, frames: int,
                    size: int) -> np.ndarray:
    """Moving bright squares on noise — enough signal for the tokenizer to
    demonstrably reduce reconstruction loss offline."""
    clips = rng.normal(0.0, 0.05, (batch, frames, size, size, 3))
    for b in range(batch):
        s = size // 4
        x0, y0 = rng.integers(0, size - s, 2)
        dx, dy = rng.integers(-2, 3, 2)
        for t in range(frames):
            x = int(np.clip(x0 + dx * t, 0, size - s))
            y = int(np.clip(y0 + dy * t, 0, size - s))
            clips[b, t, y: y + s, x: x + s] += 0.8
    return clips.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--init-dim", type=int, default=16)
    ap.add_argument("--max-dim", type=int, default=64)
    ap.add_argument("--codebook-size", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--gan-after", type=int, default=-1,
                    help="step to enable the GAN loss; -1 disables")
    ap.add_argument("--adversarial-weight", type=float, default=0.1)
    ap.add_argument("--data", type=str, default=None,
                    help=".npy of (N,T,H,W,3) clips in [0,255] or [0,1]")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    model = VideoTokenizer(
        image_size=args.image_size, init_dim=args.init_dim,
        max_dim=args.max_dim, codebook_size=args.codebook_size,
        layers=LAYERS)
    disc = FrameDiscriminator(init_dim=args.init_dim)

    rng = np.random.default_rng(args.seed)
    if args.data:
        data = np.load(args.data).astype(np.float32)
        if data.max() > 1.5:
            data = data / 255.0
    else:
        data = None

    def sample_batch():
        if data is None:
            return synthetic_batch(rng, args.batch, args.frames,
                                   args.image_size)
        idx = rng.integers(0, len(data), args.batch)
        return data[idx, : args.frames]

    video0 = jnp.asarray(sample_batch())
    params = model.init(jax.random.PRNGKey(args.seed), video0)
    d_params = disc.init(jax.random.PRNGKey(args.seed + 1), video0)
    tx = optax.adam(args.lr)
    d_tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    d_opt_state = d_tx.init(d_params)

    @jax.jit
    def g_step(params, opt_state, d_params, video, gan_on):
        def loss_fn(p):
            out = model.apply(p, video, training=True)
            gen = jnp.where(
                gan_on,
                hinge_g_loss(disc.apply(d_params, out["recon"])),
                0.0)
            return out["loss"] + args.adversarial_weight * gen, out
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, out

    @jax.jit
    def d_step(d_params, d_opt_state, video, recon):
        def loss_fn(dp):
            real = disc.apply(dp, video)
            fake = disc.apply(dp, jax.lax.stop_gradient(recon))
            return hinge_d_loss(real, fake)
        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state)
        return optax.apply_updates(d_params, updates), d_opt_state, loss

    t0 = time.time()
    for step in range(args.steps):
        video = jnp.asarray(sample_batch())
        gan_on = jnp.asarray(0 <= args.gan_after <= step)
        params, opt_state, loss, out = g_step(
            params, opt_state, d_params, video, gan_on)
        d_loss = float("nan")
        if 0 <= args.gan_after <= step:
            d_params, d_opt_state, dl = d_step(
                d_params, d_opt_state, video, out["recon"])
            d_loss = float(dl)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss={float(loss):.4f} "
                  f"recon={float(out['recon_loss']):.4f} "
                  f"aux={float(out['aux_loss']):.4f} d={d_loss:.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    return float(loss)


if __name__ == "__main__":
    main()
