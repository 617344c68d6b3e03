"""LVDM text-to-video training (reference ppdiffusers/examples/
text_to_video_lvdm/train_lvdm_text2video.py; train_lvdm_short.py is the
``--uncond`` variant): epsilon-prediction DDPM on time-compressed video
latents from the LVDM 3-D VAE, with text cross-attention states.

Offline-friendly: synthetic video latents + caption states by default;
pass --data prefix for real precomputed features
(<prefix>_latents.npy (N,T,H,W,4), <prefix>_text.npy (N,L,D)).

Usage:
    python examples/train_lvdm_text2video.py --steps 100 --frames 4
    python examples/train_lvdm_text2video.py --uncond --steps 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models import LVDMUNet3DConfig, LVDMUNet3DModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--latent-size", type=int, default=8)
    ap.add_argument("--base-channels", type=int, default=32)
    ap.add_argument("--caption-dim", type=int, default=32)
    ap.add_argument("--text-len", type=int, default=8)
    ap.add_argument("--uncond", action="store_true",
                    help="short unconditional variant (train_lvdm_short.py)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num-train-timesteps", type=int, default=1000)
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--output", type=str, default="lvdm_unet_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    c = args.base_channels
    cfg = LVDMUNet3DConfig(
        in_channels=4, out_channels=4, block_out_channels=(c, c * 2),
        layers_per_block=1, num_attention_heads=2, norm_num_groups=8,
        cross_attention_dim=None if args.uncond else args.caption_dim,
        sample_size=args.latent_size)
    unet = LVDMUNet3DModel.from_config(cfg)

    betas = np.linspace(1e-4, 0.02, args.num_train_timesteps)
    alphas_bar = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)

    tx = optax.adamw(args.lr, weight_decay=0.01)
    params = unet.params
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    if args.data:
        latents = np.load(args.data + "_latents.npy").astype(np.float32)
        texts = (np.load(args.data + "_text.npy").astype(np.float32)
                 if not args.uncond else None)
    else:
        latents = texts = None

    def batch():
        if latents is None:
            z = host.normal(size=(args.batch, args.frames, args.latent_size,
                                  args.latent_size, 4)).astype(np.float32)
            c_ = (None if args.uncond else
                  host.normal(size=(args.batch, args.text_len,
                                    args.caption_dim)).astype(np.float32))
            return z, c_
        idx = host.integers(0, len(latents), args.batch)
        return (latents[idx, : args.frames],
                None if args.uncond else texts[idx])

    @jax.jit
    def step(params, opt_state, key, z0, context):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (z0.shape[0],), 0,
                               args.num_train_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        ab = alphas_bar[t][:, None, None, None, None]
        zt = jnp.sqrt(ab) * z0 + jnp.sqrt(1 - ab) * noise

        def loss_fn(p):
            pred = unet.module.apply({"params": p}, zt, t,
                                     encoder_hidden_states=context)
            return jnp.mean(jnp.square(pred - noise))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        z, ctx = batch()
        params, opt_state, loss = step(
            params, opt_state, sub, jnp.asarray(z),
            None if ctx is None else jnp.asarray(ctx))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    unet.params = params
    unet.save_pretrained(args.output)
    print(f"saved lvdm unet -> {args.output}")


if __name__ == "__main__":
    main()
