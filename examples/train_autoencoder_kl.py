"""AutoencoderKL (VAE) training (reference ppdiffusers/examples/autoencoder/
vae/train_vae.py): reconstruction + KL objective over images, optionally with
a patch-discriminator adversarial term (the reference's LPIPSWithDiscriminator
loss; LPIPS itself needs a pretrained VGG, so the perceptual term is an
optional hook here — documented non-default).

Offline-friendly: random-pattern synthetic images by default.

Usage:
    python examples/train_autoencoder_kl.py --steps 200 --disc-start 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class PatchDiscriminator(nn.Module):
    """PatchGAN discriminator (reference NLayerDiscriminator in
    ppdiffusers/examples/autoencoder/vae/losses.py)."""

    base: int = 32
    n_layers: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base, (4, 4), strides=(2, 2))(x)
        h = nn.leaky_relu(h, 0.2)
        for i in range(1, self.n_layers):
            h = nn.Conv(self.base * 2 ** i, (4, 4), strides=(2, 2))(h)
            h = nn.GroupNorm(num_groups=8)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4))(h)


def synthetic_images(rng, n, res):
    img = rng.normal(0.5, 0.1, (n, res, res, 3)).astype(np.float32)
    for i in range(n):
        x0 = int(rng.integers(0, res // 2))
        img[i, x0:x0 + res // 2, :, i % 3] += 0.4
    return np.clip(img, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--resolution", type=int, default=32)
    ap.add_argument("--kl-weight", type=float, default=1e-6)
    ap.add_argument("--disc-weight", type=float, default=0.5)
    ap.add_argument("--disc-start", type=int, default=-1,
                    help="step to enable the adversarial term; -1 = never")
    ap.add_argument("--output", type=str, default="vae_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from paddlemix_tpu.diffusers.models import AutoencoderKL
    from paddlemix_tpu.diffusers.models.autoencoder_kl import AutoencoderKLConfig

    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        block_out_channels=(16, 32), down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=8), seed=args.seed)

    use_disc = args.disc_start >= 0
    disc = PatchDiscriminator()
    key = jax.random.PRNGKey(args.seed)
    d_params = disc.init(key, jnp.zeros((1, args.resolution, args.resolution, 3)))

    tx = optax.adam(args.lr)
    opt_state = tx.init(vae.params)
    d_tx = optax.adam(args.lr)
    d_opt = d_tx.init(d_params)

    @jax.jit
    def g_step(params, opt_state, d_params, key, images, adv_on):
        x = images * 2 - 1

        def loss_fn(p):
            post = vae.module.apply({"params": p}, x, method="encode")
            z = post.sample(key)
            rec = vae.module.apply({"params": p}, z, method="decode")
            rec_loss = jnp.mean(jnp.abs(rec - x)) + jnp.mean((rec - x) ** 2)
            kl = 0.5 * jnp.mean(post.mean ** 2 + jnp.exp(post.logvar)
                                - 1.0 - post.logvar)
            logits_fake = disc.apply(d_params, rec)
            g_adv = -jnp.mean(logits_fake)
            loss = rec_loss + args.kl_weight * kl \
                + adv_on * args.disc_weight * g_adv
            return loss, (rec_loss, kl, rec)

        (loss, (rec_loss, kl, rec)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, rec_loss, kl, rec

    @jax.jit
    def d_step(d_params, d_opt, images, rec):
        x = images * 2 - 1

        def loss_fn(dp):
            real = disc.apply(dp, x)
            fake = disc.apply(dp, jax.lax.stop_gradient(rec))
            # hinge loss (reference losses.py hinge_d_loss)
            return 0.5 * (jnp.mean(nn.relu(1.0 - real))
                          + jnp.mean(nn.relu(1.0 + fake)))

        loss, g = jax.value_and_grad(loss_fn)(d_params)
        updates, d_opt = d_tx.update(g, d_opt)
        return optax.apply_updates(d_params, updates), d_opt, loss

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        images = jnp.asarray(synthetic_images(rng, args.batch, args.resolution))
        key, sub = jax.random.split(key)
        adv_on = jnp.float32(1.0 if use_disc and it >= args.disc_start else 0.0)
        vae.params, opt_state, loss, rec_l, kl, rec = g_step(
            vae.params, opt_state, d_params, sub, images, adv_on)
        d_loss = 0.0
        if use_disc and it >= args.disc_start:
            d_params, d_opt, d_loss = d_step(d_params, d_opt, images, rec)
        if it % 25 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} rec={float(rec_l):.4f} "
                  f"kl={float(kl):.4f} d={float(d_loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    vae.save_pretrained(args.output)
    print(f"saved vae -> {args.output}")


if __name__ == "__main__":
    main()
