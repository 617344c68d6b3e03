"""NaViT patch-n-pack training (reference ppdiffusers/examples/navit/
example.py over navit.py).

Variable-resolution synthetic classification: each image's class is the
quadrant holding a bright square, at a random (patch-divisible) resolution.
Images are greedily grouped by max_seq_len, packed into static buffers, and
trained with masked cross-entropy — losses only over real images, never the
pack padding.

Usage:
    python examples/train_navit.py --steps 100 --max-seq-len 256
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.models.navit import (
    NaViTConfig,
    NaViTModel,
    group_images_by_max_seq_len,
    pack_images,
)


def synthetic_image(rng: np.random.Generator, patch_size: int):
    """Random resolution in {2..4} patches per side; class = bright quadrant."""
    h = int(rng.integers(2, 5)) * patch_size
    w = int(rng.integers(2, 5)) * patch_size
    img = rng.normal(0, 0.1, (h, w, 3)).astype(np.float32)
    label = int(rng.integers(0, 4))
    y0 = 0 if label < 2 else h // 2
    x0 = 0 if label % 2 == 0 else w // 2
    img[y0: y0 + h // 2, x0: x0 + w // 2] += 1.0
    return img, label


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--images-per-step", type=int, default=16)
    ap.add_argument("--patch-size", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--token-dropout", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = NaViTConfig(
        image_size=args.patch_size * 8, patch_size=args.patch_size,
        num_classes=4, dim=args.dim, depth=args.depth, heads=4,
        dim_head=args.dim // 4, mlp_dim=args.dim * 4,
        max_seq_len=args.max_seq_len, max_images_per_pack=8)
    model = NaViTModel.from_config(cfg)
    tx = optax.adam(args.lr)
    params = model.params
    opt_state = tx.init(params)
    rng = np.random.default_rng(args.seed)

    @jax.jit
    def step(params, opt_state, patches, positions, image_ids, num_images,
             labels):
        def loss_fn(p):
            logits, valid = model.module.apply(
                {"params": p}, patches, positions, image_ids, num_images)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            loss = jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * valid) \
                / jnp.maximum(jnp.sum(valid), 1)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.time()
    for it in range(args.steps):
        pairs = [synthetic_image(rng, args.patch_size)
                 for _ in range(args.images_per_step)]
        images = [p[0] for p in pairs]
        label_of = {id(im): lb for im, (_, lb) in zip(images, pairs)}
        groups = group_images_by_max_seq_len(
            images, args.patch_size, args.max_seq_len)
        # fixed pack-count batches keep the jit cache to one entry
        while len(groups) < 4:
            groups.append([images[0]])
        groups = groups[:4]
        packed = pack_images(groups, args.patch_size, args.max_seq_len,
                             args.token_dropout, rng)
        labels = np.zeros((len(groups), cfg.max_images_per_pack), np.int32)
        for gi, group in enumerate(groups):
            for ii, im in enumerate(group):
                labels[gi, ii] = label_of[id(im)]
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(packed["patches"]),
            jnp.asarray(packed["positions"]),
            jnp.asarray(packed["image_ids"]),
            jnp.asarray(packed["num_images"]), jnp.asarray(labels))
        if it % 10 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} acc={float(acc):.3f} "
                  f"packs={len(groups)} ({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
