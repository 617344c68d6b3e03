"""SDXL static inference driver.

TPU counterpart of the reference's deploy (ppdiffusers/deploy/infer.py
paddle-inference drivers): the serving process loads the AOT-exported
unet_step + vae_decode and runs the scheduler loop host-side — no tracing,
per-step latency is one executable dispatch.

Usage:
  python deploy/sdxl/infer.py --export-dir ./sdxl_export \
      --prompt "a photo of a fox" --steps 25 --output out.png
  # without exported text encoders: --random-context (smoke/benchmarks)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export-dir", required=True)
    ap.add_argument("--prompt", default="a photo")
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--guidance-scale", type=float, default=5.0)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--random-context", action="store_true",
                    help="skip text encoders (random context; smoke runs)")
    ap.add_argument("--output", default="out.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paddlemix_tpu.deploy import load_fn
    from paddlemix_tpu.diffusers import EulerDiscreteScheduler
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        UNet2DConditionModel,
    )

    unet = UNet2DConditionModel.from_pretrained(args.export_dir,
                                                subfolder="unet")
    vae = AutoencoderKL.from_pretrained(args.export_dir, subfolder="vae")
    unet_step = load_fn(os.path.join(args.export_dir, "unet_step.jaxexport"))
    vae_decode = load_fn(os.path.join(args.export_dir,
                                      "vae_decode.jaxexport"))

    h, w = args.height // 8, args.width // 8
    ctx_dim = unet.config.cross_attention_dim
    ctx_dim = ctx_dim if isinstance(ctx_dim, int) else ctx_dim[0]
    text_dim = unet.config.projection_class_embeddings_input_dim - \
        6 * unet.config.addition_time_embed_dim

    if args.random_context:
        key = jax.random.PRNGKey(args.seed + 1)
        k1, k2 = jax.random.split(key)
        context = jax.random.normal(k1, (2, 77, ctx_dim), jnp.bfloat16)
        text_embeds = jax.random.normal(k2, (2, text_dim), jnp.bfloat16)
    else:
        from paddlemix_tpu.diffusers.pipelines import (
            StableDiffusionXLPipeline,
        )

        pipe = StableDiffusionXLPipeline.from_pretrained(args.export_dir)
        (context, text_embeds) = pipe.encode_prompt(
            [args.prompt], [args.negative_prompt])[:2]
        context = context.astype(jnp.bfloat16)
        text_embeds = text_embeds.astype(jnp.bfloat16)
    time_ids = jnp.broadcast_to(
        jnp.asarray([args.height, args.width, 0, 0,
                     args.height, args.width], jnp.bfloat16), (2, 6))

    sched = EulerDiscreteScheduler()
    state = sched.set_timesteps(args.steps)
    lat = jax.random.normal(jax.random.PRNGKey(args.seed), (1, h, w, 4),
                            jnp.float32) * sched.init_noise_sigma

    t0 = time.time()
    for i in range(args.steps):
        t = state.timesteps[i]
        lat_in = jnp.concatenate([lat, lat]).astype(jnp.bfloat16)
        lat_in = sched.scale_model_input(state, lat_in, i)
        eps = unet_step(unet.params, lat_in,
                        jnp.broadcast_to(t, (2,)).astype(jnp.float32),
                        context, text_embeds, time_ids).astype(jnp.float32)
        un, co = np.split(np.asarray(eps), 2)
        eps = jnp.asarray(un + args.guidance_scale * (co - un))
        lat, state = sched.step(state, eps, i, lat)
    img = vae_decode(vae.params,
                     (lat / vae.config.scaling_factor).astype(jnp.float32))
    img = np.asarray(jnp.clip(jnp.asarray(img) / 2 + 0.5, 0, 1))[0]
    dt = time.time() - t0
    print(f"# {args.steps} steps in {dt:.2f}s ({args.steps / dt:.2f} it/s)")

    from PIL import Image

    Image.fromarray((img * 255).astype(np.uint8)).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
