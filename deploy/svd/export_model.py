"""Export Stable Video Diffusion for static-shape serving.

TPU counterpart of the reference's SVD deploy scripts: serializes the
spatio-temporal UNet CFG denoise step and the temporal-decoder VAE as
jax.export computations at fixed (frames, height, width).

Usage:
  python deploy/svd/export_model.py --model-path <pipeline-dir> \
      --output ./svd_export --frames 14 --height 576 --width 1024
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
    ap.add_argument("--output", default="./svd_export")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKLTemporalDecoder,
        UNetSpatioTemporalConditionModel,
    )

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    unet = UNetSpatioTemporalConditionModel.from_pretrained(
        args.model_path, subfolder="unet")
    vae = AutoencoderKLTemporalDecoder.from_pretrained(
        args.model_path, subfolder="vae")

    os.makedirs(args.output, exist_ok=True)
    unet.save_pretrained(os.path.join(args.output, "unet"))
    vae.save_pretrained(os.path.join(args.output, "vae"))

    cfg = unet.config
    f, h, w = args.frames, args.height // 8, args.width // 8
    b = 2  # CFG pair

    def unet_step(params, latents, t, image_embeds, added_time_ids):
        return unet.module.apply({"params": params}, latents, t,
                                 image_embeds, added_time_ids)

    export_fn(unet_step,
              (unet.params,
               jnp.zeros((b, f, h, w, cfg.in_channels), jnp.bfloat16),
               jnp.zeros((), jnp.float32),
               jnp.zeros((b, 1, cfg.cross_attention_dim), jnp.bfloat16),
               jnp.zeros((b, 3), jnp.bfloat16)),
              os.path.join(args.output, "unet_step.jaxexport"))

    def vae_decode(params, z):
        return vae.module.apply({"params": params}, z, num_frames=f,
                                method=vae.module.decode)

    export_fn(vae_decode,
              (vae.params,
               jnp.zeros((f, h, w, cfg.out_channels), jnp.float32)),
              os.path.join(args.output, "vae_decode.jaxexport"))
    print(f"exported unet_step + vae_decode to {args.output}")


if __name__ == "__main__":
    main()
