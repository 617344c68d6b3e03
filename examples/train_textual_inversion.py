"""Textual inversion training (reference ppdiffusers/examples/
textual_inversion/train_textual_inversion.py): learn ONE new token
embedding that reconstructs a handful of concept images through a frozen
SD model; only the placeholder row of the token embedding table gets
gradients.

Offline-friendly: synthetic concept images by default (a fixed color/shape
pattern); pass --images dir/*.png for real ones. The learned vector saves
in the diffusers learned_embeds layout consumed by
paddlemix_tpu.diffusers.loaders.load_textual_inversion.

Usage:
    python examples/train_textual_inversion.py --steps 100 \
        --placeholder-token "<cat-toy>" --initializer-token toy
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", type=str, default=None,
                    help="SD pipeline dir; tiny from-config model if unset")
    ap.add_argument("--placeholder-token", type=str, default="<concept>")
    ap.add_argument("--initializer-token", type=str, default="a")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--images", type=str, default=None)
    ap.add_argument("--output", type=str, default="learned_embeds.safetensors")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from paddlemix_tpu.diffusers import DiffusionPipeline

    if args.pretrained:
        pipe = DiffusionPipeline.from_pretrained(args.pretrained)
    else:
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

        from paddlemix_tpu.diffusers import DDPMScheduler, StableDiffusionPipeline

        tok = tiny_tokenizer()
        pipe = StableDiffusionPipeline(
            vae=tiny_vae(), text_encoder=tiny_text_encoder(tok),
            tokenizer=tok, unet=tiny_unet(), scheduler=DDPMScheduler())

    tok, enc = pipe.tokenizer, pipe.text_encoder
    unet, vae, sched = pipe.unet, pipe.vae, pipe.scheduler

    # the embedding row being optimized: the placeholder reuses the
    # initializer token's id, and ONLY that row of the token-embedding
    # table receives gradients (reference train_textual_inversion.py
    # zeroes every other row's grad)
    init_ids = [t for t in tok.encode(args.initializer_token)
                if t not in (tok.bos_token_id, tok.eos_token_id)]
    tid = init_ids[0]
    table = enc.params["text_model"]["token_embedding"]["embedding"]
    vec = jnp.asarray(table[tid], jnp.float32)

    prompt = f"a photo of {args.placeholder_token}"
    ids = tok([prompt.replace(args.placeholder_token,
                              args.initializer_token)])["input_ids"]
    ids = jnp.asarray(ids)

    def concept_batch(rng):
        img = rng.normal(0, 0.05, (2, args.resolution, args.resolution, 3))
        img[:, 8:-8, 8:-8, 0] += 0.9  # the "concept": a red square
        return img.astype(np.float32)

    n_train = getattr(sched, "num_train_timesteps", 1000)
    tx = optax.adam(args.lr)
    opt_state = tx.init(vec)
    rng = np.random.default_rng(args.seed)

    @jax.jit
    def step(vec, opt_state, key, images):
        def loss_fn(v):
            p2 = jax.tree_util.tree_map(lambda x: x, enc.params)
            emb = p2["text_model"]["token_embedding"]["embedding"]
            p2["text_model"]["token_embedding"]["embedding"] = \
                emb.at[tid].set(v.astype(emb.dtype))
            hidden = enc.module.apply({"params": p2}, ids)[0]
            kz, kt, kn = jax.random.split(key, 3)
            lat = vae.encode(images * 2 - 1).mode() * vae.config.scaling_factor
            t = jax.random.randint(kt, (lat.shape[0],), 0, n_train)
            noise = jax.random.normal(kn, lat.shape)
            noisy = sched.add_noise(lat, noise, t)
            ctx = jnp.broadcast_to(hidden, (lat.shape[0],) + hidden.shape[1:])
            pred = unet.module.apply({"params": unet.params},
                                     noisy.astype(unet.dtype),
                                     t.astype(jnp.float32),
                                     ctx.astype(unet.dtype)).astype(jnp.float32)
            return jnp.mean((pred - noise) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(vec)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(vec, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        vec, opt_state, loss = step(vec, opt_state, sub,
                                    jnp.asarray(concept_batch(rng)))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    # diffusers learned_embeds layout
    from safetensors.numpy import save_file

    save_file({args.placeholder_token: np.asarray(vec)[None]}, args.output)
    print(f"saved {args.placeholder_token} -> {args.output}")


if __name__ == "__main__":
    main()
