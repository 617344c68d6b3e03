"""Open-Sora STDiT2 video-diffusion training (reference
ppdiffusers/examples/Open-Sora training loop over
models/stdit/stdit2.py): epsilon-prediction DDPM on (T, H, W) video
latents with T5 caption states and fps conditioning.

Offline-friendly: synthetic latent clips + caption states by default;
pass --data prefix for real precomputed features
(<prefix>_latents.npy (N,T,H,W,C), <prefix>_text.npy (N,L,D)).

Usage:
    python examples/train_opensora_stdit.py --steps 100 --frames 4
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models import STDiT2Config, STDiT2Model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--latent-size", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--caption-dim", type=int, default=32)
    ap.add_argument("--text-len", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num-train-timesteps", type=int, default=1000)
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = STDiT2Config(
        input_size=(None, args.latent_size, args.latent_size),
        in_channels=4, hidden_size=args.hidden, depth=args.depth,
        num_heads=args.heads, caption_channels=args.caption_dim,
        model_max_length=args.text_len)
    model = STDiT2Model.from_config(cfg)

    betas = np.linspace(1e-4, 0.02, args.num_train_timesteps)
    alphas_bar = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)

    tx = optax.adamw(args.lr, weight_decay=0.01)
    params = model.params
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    if args.data:
        latents = np.load(args.data + "_latents.npy").astype(np.float32)
        texts = np.load(args.data + "_text.npy").astype(np.float32)
    else:
        latents = texts = None

    def batch():
        if latents is None:
            z = host.normal(size=(args.batch, args.frames, args.latent_size,
                                  args.latent_size, 4)).astype(np.float32)
            c = host.normal(size=(args.batch, args.text_len,
                                  args.caption_dim)).astype(np.float32)
            return z, c
        idx = host.integers(0, len(latents), args.batch)
        return latents[idx, : args.frames], texts[idx]

    @jax.jit
    def step(params, opt_state, key, z0, context):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (z0.shape[0],), 0,
                               args.num_train_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        ab = alphas_bar[t][:, None, None, None, None]
        zt = jnp.sqrt(ab) * z0 + jnp.sqrt(1 - ab) * noise

        def loss_fn(p):
            pred = model.module.apply({"params": p}, zt, t, context,
                                      fps=jnp.asarray(8.0))
            # learn_sigma heads predict [eps, var]: train the eps half
            pred = pred[..., : z0.shape[-1]]
            return jnp.mean(jnp.square(pred - noise))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        z, c = batch()
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(z), jnp.asarray(c))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
