"""AnimateAnyone two-stage training (reference ppdiffusers/examples/
AnimateAnyone/src/trainer/model.py AnimateAnyoneModel_stage{1,2} +
scripts/trainer_stage{1,2}.py):

- ``--stage 1`` (pose2image): single frame; gradients flow to the denoising
  UNet, the reference UNet, and the pose guider. Epsilon prediction with
  min-SNR weighting and classifier-free dropout of the CLIP image context.
- ``--stage 2`` (pose2video): multi-frame clips; ONLY the motion modules of
  the denoising UNet train (everything else frozen), via optax
  multi_transform masking.

Offline-friendly: synthetic latents / poses / image embeddings.

Usage:
    python examples/train_animate_anyone.py --stage 1 --steps 100
    python examples/train_animate_anyone.py --stage 2 --frames 4 --steps 100
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlemix_tpu.diffusers.models import (
    UNet2DConditionConfig,
    UNet2DConditionModel,
    UNetMotionConfig,
    UNetMotionModel,
)
from paddlemix_tpu.diffusers.models.animate_anyone import (
    PoseGuider,
    PoseGuiderConfig,
    extract_reference_features,
    tile_reference_features,
)


def min_snr_weight(alphas_bar, t, gamma: float = 5.0):
    """min(SNR, gamma)/SNR epsilon-loss weight (reference model.py
    compute_snr + the stage trainers' snr_gamma branch)."""
    ab = alphas_bar[t]
    snr = ab / (1.0 - ab)
    return jnp.minimum(snr, gamma) / snr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, choices=(1, 2), default=1)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--latent-size", type=int, default=8)
    ap.add_argument("--base-channels", type=int, default=16)
    ap.add_argument("--ctx-dim", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--uncond-ratio", type=float, default=0.1)
    ap.add_argument("--snr-gamma", type=float, default=5.0)
    ap.add_argument("--num-train-timesteps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    c = args.base_channels
    unet_kw = dict(sample_size=args.latent_size,
                   block_out_channels=(c, c * 2),
                   down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                   up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                   layers_per_block=1, cross_attention_dim=args.ctx_dim,
                   attention_head_dim=2, norm_num_groups=8)
    frames = 1 if args.stage == 1 else args.frames

    ref_unet = UNet2DConditionModel.from_config(
        UNet2DConditionConfig.from_dict(unet_kw))
    den_unet = UNetMotionModel.from_config(
        UNetMotionConfig.from_dict(dict(unet_kw, num_frames=frames,
                                        motion_num_heads=2)))
    pose_guider = PoseGuider.from_config(PoseGuiderConfig(
        conditioning_embedding_channels=c, block_out_channels=(8, 8, 8, 8)))

    betas = np.linspace(1e-4, 0.02, args.num_train_timesteps)
    alphas_bar = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)

    params = {"den": den_unet.params, "ref": ref_unet.params,
              "pose": pose_guider.params}

    if args.stage == 1:
        tx = optax.adamw(args.lr, weight_decay=1e-2)
    else:
        # stage 2: only the denoising UNet's motion modules receive updates
        def label_tree(p):
            flat = jax.tree_util.tree_flatten_with_path(p)[0]
            labels = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(p),
                ["train" if any("motion" in str(getattr(k, "key", k))
                                for k in path) else "frozen"
                 for path, _ in flat])
            return labels

        tx = optax.multi_transform(
            {"train": optax.adamw(args.lr, weight_decay=1e-2),
             "frozen": optax.set_to_zero()},
            {"den": label_tree(params["den"]),
             "ref": jax.tree_util.tree_map(lambda _: "frozen",
                                           params["ref"],
                                           is_leaf=lambda x: hasattr(x, "shape")),
             "pose": jax.tree_util.tree_map(lambda _: "frozen",
                                            params["pose"],
                                            is_leaf=lambda x: hasattr(x, "shape"))})
    opt_state = tx.init(params)
    host = np.random.default_rng(args.seed)

    pose_hw = args.latent_size * 8  # guider reduces 8x to latent grid

    @jax.jit
    def step(params, opt_state, key, z0, poses, clip_emb):
        kt, kn, kd = jax.random.split(key, 3)
        b = z0.shape[0]
        t = jax.random.randint(kt, (b,), 0, args.num_train_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        ab = alphas_bar[t][:, None, None, None, None]
        zt = jnp.sqrt(ab) * z0 + jnp.sqrt(1 - ab) * noise

        # classifier-free dropout of the image context (uncond_fwd)
        keep = (jax.random.uniform(kd, (b, 1, 1))
                >= args.uncond_ratio).astype(z0.dtype)
        ctx = clip_emb * keep

        def loss_fn(p):
            refs = extract_reference_features(
                type("V", (), {"module": ref_unet.module,
                               "params": p["ref"],
                               "dtype": ref_unet.dtype})(),
                z0[:, 0], jnp.asarray(0), ctx)
            refs = tile_reference_features(refs, z0.shape[1])
            pose_fea = pose_guider.module.apply({"params": p["pose"]}, poses)
            pred = den_unet.module.apply(
                {"params": p["den"]}, zt, t, ctx,
                reference_features=list(refs), pose_cond=pose_fea)
            w = min_snr_weight(alphas_bar, t, args.snr_gamma)
            per = jnp.mean(jnp.square(pred - noise), axis=(1, 2, 3, 4))
            return jnp.mean(w * per)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    den0 = params["den"]
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        z = host.normal(size=(args.batch, frames, args.latent_size,
                              args.latent_size, 4)).astype(np.float32)
        poses = host.random(size=(args.batch, frames, pose_hw, pose_hw,
                                  3)).astype(np.float32)
        emb = host.normal(size=(args.batch, 1,
                                args.ctx_dim)).astype(np.float32)
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(z), jnp.asarray(poses),
                                       jnp.asarray(emb))
        if it % 20 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    if args.stage == 2:
        # report how many non-motion weights moved (should be none)
        flat0 = jax.tree_util.tree_flatten_with_path(den0)[0]
        flat1 = jax.tree_util.tree_flatten_with_path(params["den"])[0]
        moved = sum(
            1 for (path, a), (_, b_) in zip(flat0, flat1)
            if not any("motion" in str(getattr(k, "key", k)) for k in path)
            and not np.allclose(np.asarray(a), np.asarray(b_)))
        print(f"frozen weights changed: {moved}")


if __name__ == "__main__":
    main()
