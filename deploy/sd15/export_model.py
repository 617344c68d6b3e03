"""Export SD 1.5/2.x for static-shape serving.

TPU counterpart of the reference's ppdiffusers/deploy/sd15 export scripts:
serializes the UNet CFG denoise step and VAE decoder via jax.export.

Usage:
  python deploy/sd15/export_model.py --model-path <pipeline-dir> \
      --output ./sd15_export --height 512 --width 512
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--output", default="./sd15_export")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--text-len", type=int, default=77)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.diffusers.models import AutoencoderKL, UNet2DConditionModel

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    unet = UNet2DConditionModel.from_pretrained(args.model_path,
                                                subfolder="unet")
    vae = AutoencoderKL.from_pretrained(args.model_path, subfolder="vae")
    os.makedirs(args.output, exist_ok=True)
    unet.save_pretrained(os.path.join(args.output, "unet"))
    vae.save_pretrained(os.path.join(args.output, "vae"))

    h, w = args.height // 8, args.width // 8
    b = args.batch * 2  # CFG pair
    ctx_dim = unet.config.cross_attention_dim
    ctx_dim = ctx_dim if isinstance(ctx_dim, int) else ctx_dim[0]

    def unet_step(params, latents, t, context):
        return unet.module.apply({"params": params}, latents, t, context)

    export_fn(unet_step,
              (unet.params,
               jnp.zeros((b, h, w, unet.config.in_channels), jnp.bfloat16),
               jnp.zeros((b,), jnp.float32),
               jnp.zeros((b, args.text_len, ctx_dim), jnp.bfloat16)),
              os.path.join(args.output, "unet_step.jaxexport"))

    def vae_decode(params, z):
        return vae.module.apply({"params": params}, z,
                                method=vae.module.decode)

    export_fn(vae_decode,
              (vae.params, jnp.zeros((args.batch, h, w,
                                      vae.config.latent_channels),
                                     jnp.float32)),
              os.path.join(args.output, "vae_decode.jaxexport"))
    print(f"exported unet_step + vae_decode to {args.output}")


if __name__ == "__main__":
    main()
