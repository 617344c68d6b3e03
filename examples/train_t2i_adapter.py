"""T2I-Adapter training (reference ppdiffusers/examples/t2i-adapter/
train_t2i_adapter_trainer.py): learn the lightweight adapter trunk that maps
a control image (sketch/edges/depth) to per-resolution features injected into
a FROZEN Stable Diffusion UNet's down blocks; only the adapter gets gradients.

Offline-friendly: synthetic (image, control) pairs by default — the target is
a colored square and the control is its edge map; pass --pretrained for a real
SD pipeline directory.

Usage:
    python examples/train_t2i_adapter.py --steps 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def synthetic_pair(rng, n, res):
    """Target image: a random colored square; control: its edge map."""
    img = np.zeros((n, res, res, 3), np.float32)
    ctl = np.zeros((n, res, res, 3), np.float32)
    for i in range(n):
        x0, y0 = rng.integers(4, res // 2, 2)
        w = int(rng.integers(res // 4, res // 2))
        c = rng.uniform(0.3, 1.0, 3)
        img[i, y0:y0 + w, x0:x0 + w] = c
        ctl[i, y0:y0 + w, [x0, min(x0 + w, res - 1)]] = 1.0
        ctl[i, [y0, min(y0 + w, res - 1)], x0:x0 + w] = 1.0
    return img, ctl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", type=str, default=None)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--output", type=str, default="t2i_adapter_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from paddlemix_tpu.diffusers.models import T2IAdapter, T2IAdapterConfig

    if args.pretrained:
        from paddlemix_tpu.diffusers import DiffusionPipeline

        pipe = DiffusionPipeline.from_pretrained(args.pretrained)
        adapter = T2IAdapter.from_config(T2IAdapterConfig(
            channels=tuple(pipe.unet.config.block_out_channels),
            downscale_factor=8), seed=args.seed)
    else:
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

        from paddlemix_tpu.diffusers import DDPMScheduler, StableDiffusionPipeline

        tok = tiny_tokenizer()
        pipe = StableDiffusionPipeline(
            vae=tiny_vae(), text_encoder=tiny_text_encoder(tok),
            tokenizer=tok, unet=tiny_unet(), scheduler=DDPMScheduler())
        # tiny_vae downscales 2x -> adapter factor 2 matches the latent grid
        adapter = T2IAdapter.from_config(T2IAdapterConfig(
            channels=tuple(pipe.unet.config.block_out_channels),
            num_res_blocks=1, downscale_factor=2), seed=args.seed)

    unet, vae, sched, tok, enc = (pipe.unet, pipe.vae, pipe.scheduler,
                                  pipe.tokenizer, pipe.text_encoder)
    ids = jnp.asarray(tok(["a square"])["input_ids"])
    ctx_one = enc(ids)[0]
    n_train = getattr(sched, "num_train_timesteps", 1000)

    tx = optax.adamw(args.lr, weight_decay=1e-2)
    opt_state = tx.init(adapter.params)

    @jax.jit
    def step(a_params, opt_state, key, images, controls):
        def loss_fn(ap_):
            kz, kt, kn = jax.random.split(key, 3)
            lat = vae.encode(images * 2 - 1).sample(kz) * vae.config.scaling_factor
            t = jax.random.randint(kt, (lat.shape[0],), 0, n_train)
            noise = jax.random.normal(kn, lat.shape)
            noisy = sched.add_noise(lat, noise, t)
            feats = adapter.module.apply({"params": ap_},
                                         (controls * 2 - 1).astype(adapter.dtype))
            ctx = jnp.broadcast_to(ctx_one, (lat.shape[0],) + ctx_one.shape[1:])
            pred = unet.module.apply(
                {"params": unet.params}, noisy.astype(unet.dtype),
                t.astype(jnp.float32), ctx.astype(unet.dtype),
                down_intrablock_additional_residuals=[f.astype(jnp.float32)
                                                      for f in feats],
            ).astype(jnp.float32)
            return jnp.mean((pred - noise) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(a_params)
        updates, opt_state = tx.update(g, opt_state, a_params)
        return optax.apply_updates(a_params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        img, ctl = synthetic_pair(rng, args.batch, args.resolution)
        key, sub = jax.random.split(key)
        adapter.params, opt_state, loss = step(
            adapter.params, opt_state, sub, jnp.asarray(img), jnp.asarray(ctl))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    adapter.save_pretrained(args.output)
    print(f"saved adapter -> {args.output}")


if __name__ == "__main__":
    main()
