"""IP-Adapter training (reference ppdiffusers/examples/ip_adapter/
tutorial_train.py): train ONLY the image-projection head and the decoupled
cross-attention to_k_ip/to_v_ip weights on a frozen SD stack, conditioning
denoising on a CLIP image embedding of the target image.

Offline-friendly: synthetic image/embedding pairs by default. The trainable
mask selects to_k_ip/to_v_ip by parameter path, everything else frozen —
the reference's ip_adapter.attn_processors split, done as an optax mask.

Usage:
    python examples/train_ip_adapter.py --steps 200 --ip-tokens 4
"""

import argparse
import re
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--resolution", type=int, default=32)
    ap.add_argument("--ip-tokens", type=int, default=4)
    ap.add_argument("--embed-dim", type=int, default=16,
                    help="CLIP image embedding width")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_vae

    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import (
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    tok = tiny_tokenizer()
    enc = tiny_text_encoder(tok)
    vae = tiny_vae()
    sched = DDPMScheduler()
    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(
        dict(sample_size=8, block_out_channels=(16, 32),
             down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
             up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
             layers_per_block=1, cross_attention_dim=32,
             attention_head_dim=2, norm_num_groups=8,
             ip_adapter_tokens=args.ip_tokens)))

    ctx_dim = 32
    rng0 = jax.random.PRNGKey(args.seed)
    # image projection head: CLIP embedding -> ip_tokens x ctx_dim
    proj = {"kernel": jax.random.normal(
        rng0, (args.embed_dim, args.ip_tokens * ctx_dim)) * 0.02,
        "bias": jnp.zeros((args.ip_tokens * ctx_dim,))}

    ids = jnp.asarray(tok(["a photo"])["input_ids"])
    text_ctx = enc(ids)[0]

    is_ip = lambda path: bool(re.search(r"to_[kv]_ip", path))

    def trainable_mask(tree, pred):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        paths = {"/".join(str(getattr(k, "key", k)) for k in p): pred(
            "/".join(str(getattr(k, "key", k)) for k in p)) for p, _ in flat}
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree),
            [paths["/".join(str(getattr(k, "key", k)) for k in p)]
             for p, _ in flat])

    unet_labels = trainable_mask(
        unet.params, lambda p: "train" if is_ip(p) else "freeze")
    n_train = getattr(sched, "num_train_timesteps", 1000)
    params = {"proj": proj, "unet": unet.params}
    labels = {"proj": jax.tree_util.tree_map(lambda _: "train", proj),
              "unet": unet_labels}
    # frozen params get zero updates (optax.masked would pass RAW gradients
    # through unmasked leaves)
    tx = optax.multi_transform(
        {"train": optax.adam(args.lr), "freeze": optax.set_to_zero()},
        labels)
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    def batch():
        img = host.normal(0, 0.05, (args.batch, args.resolution,
                                    args.resolution, 3))
        emb = host.normal(size=(args.batch, args.embed_dim))
        img[:, 4:-4, 4:-4, 1] += emb[:, 0:1, None] * 0.2 + 0.5
        return img.astype(np.float32), emb.astype(np.float32)

    @jax.jit
    def step(params, opt_state, key, images, image_embeds):
        def loss_fn(p):
            ip_tokens = (image_embeds @ p["proj"]["kernel"]
                         + p["proj"]["bias"]).reshape(
                image_embeds.shape[0], args.ip_tokens, ctx_dim)
            ctx = jnp.broadcast_to(text_ctx,
                                   (images.shape[0],) + text_ctx.shape[1:])
            ctx = jnp.concatenate([ctx, ip_tokens.astype(ctx.dtype)], axis=1)
            kt, kn = jax.random.split(key)
            lat = vae.encode(images * 2 - 1).mode() * vae.config.scaling_factor
            t = jax.random.randint(kt, (lat.shape[0],), 0, n_train)
            noise = jax.random.normal(kn, lat.shape)
            noisy = sched.add_noise(lat, noise, t)
            pred = unet.module.apply({"params": p["unet"]},
                                     noisy, t.astype(jnp.float32),
                                     ctx).astype(jnp.float32)
            return jnp.mean((pred - noise) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        img, emb = batch()
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(img), jnp.asarray(emb))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    # verify only ip weights moved
    moved = frozen = 0
    for (p1, l1), (_, l2) in zip(
            jax.tree_util.tree_flatten_with_path(unet.params)[0],
            jax.tree_util.tree_flatten_with_path(params["unet"])[0]):
        path = "/".join(str(getattr(k, "key", k)) for k in p1)
        changed = not np.allclose(np.asarray(l1), np.asarray(l2))
        if is_ip(path):
            moved += changed
        else:
            frozen += changed
    print(f"ip weights changed: {moved}, frozen weights changed: {frozen}")


if __name__ == "__main__":
    main()
