"""Export SD+ControlNet for static-shape serving.

TPU counterpart of the reference's ppdiffusers/deploy controlnet export:
serializes the fused (controlnet residuals -> UNet) CFG denoise step at a
fixed resolution, plus the VAE decoder.

Usage:
  python deploy/controlnet/export_model.py --model-path <pipeline-dir> \
      --controlnet-path <cn-dir> --output ./cn_export --height 512 --width 512
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
    ap.add_argument("--controlnet-path", required=True)
    ap.add_argument("--output", default="./cn_export")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--text-len", type=int, default=77)
    ap.add_argument("--conditioning-scale", type=float, default=1.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        ControlNetModel,
        UNet2DConditionModel,
    )

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    unet = UNet2DConditionModel.from_pretrained(args.model_path,
                                                subfolder="unet")
    vae = AutoencoderKL.from_pretrained(args.model_path, subfolder="vae")
    cn = ControlNetModel.from_pretrained(args.controlnet_path)
    os.makedirs(args.output, exist_ok=True)
    unet.save_pretrained(os.path.join(args.output, "unet"))
    vae.save_pretrained(os.path.join(args.output, "vae"))
    cn.save_pretrained(os.path.join(args.output, "controlnet"))

    h, w = args.height // 8, args.width // 8
    b = 2  # CFG pair
    ctx_dim = unet.config.cross_attention_dim
    ctx_dim = ctx_dim if isinstance(ctx_dim, int) else ctx_dim[0]
    scale = float(args.conditioning_scale)

    def step(unet_params, cn_params, latents, t, context, control):
        down_res, mid_res = cn.module.apply(
            {"params": cn_params}, latents, t, context, control, scale)
        return unet.module.apply(
            {"params": unet_params}, latents, t, context,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)

    export_fn(step,
              (unet.params, cn.params,
               jnp.zeros((b, h, w, unet.config.in_channels), jnp.bfloat16),
               jnp.zeros((b,), jnp.float32),
               jnp.zeros((b, args.text_len, ctx_dim), jnp.bfloat16),
               jnp.zeros((b, args.height, args.width, 3), jnp.bfloat16)),
              os.path.join(args.output, "cn_unet_step.jaxexport"))

    def vae_decode(params, z):
        return vae.module.apply({"params": params}, z,
                                method=vae.module.decode)

    export_fn(vae_decode,
              (vae.params, jnp.zeros((1, h, w, vae.config.latent_channels),
                                     jnp.float32)),
              os.path.join(args.output, "vae_decode.jaxexport"))
    print(f"exported cn_unet_step + vae_decode to {args.output}")


if __name__ == "__main__":
    main()
