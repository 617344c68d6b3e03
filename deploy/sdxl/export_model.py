"""Export SDXL for static-shape serving.

TPU counterpart of the reference's ppdiffusers/deploy/sdxl/export_model.py
(paddle static graph + paddle-inference): serializes the UNet CFG denoise
step and the VAE decoder as jax.export computations at a fixed resolution,
plus the weights. Optional int8/ToMe fast path baked into the exported
program (the reference bakes the same levers into its TRT engines).

Usage:
  python deploy/sdxl/export_model.py --model-path <pipeline-dir> \
      --output ./sdxl_export --height 1024 --width 1024 [--quant a8w8]
      [--tome 0.5]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--output", default="./sdxl_export")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--quant", choices=["a8w8"], default=None)
    ap.add_argument("--tome", type=float, default=0.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        UNet2DConditionModel,
    )

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    unet = UNet2DConditionModel.from_pretrained(args.model_path,
                                                subfolder="unet")
    if args.quant or args.tome:
        unet.config = dataclasses.replace(unet.config, quant=args.quant,
                                          tome_ratio=args.tome)
        unet.module = unet.module_class(unet.config, dtype=unet.dtype)
    vae = AutoencoderKL.from_pretrained(args.model_path, subfolder="vae")

    os.makedirs(args.output, exist_ok=True)
    unet.save_pretrained(os.path.join(args.output, "unet"))
    vae.save_pretrained(os.path.join(args.output, "vae"))

    h = args.height // 8
    w = args.width // 8
    b = args.batch * 2  # CFG pair
    ctx_dim = unet.config.cross_attention_dim
    ctx_dim = ctx_dim if isinstance(ctx_dim, int) else ctx_dim[0]
    text_dim = unet.config.projection_class_embeddings_input_dim - \
        6 * unet.config.addition_time_embed_dim

    def unet_step(params, latents, t, context, text_embeds, time_ids):
        return unet.module.apply(
            {"params": params}, latents, t, context,
            added_cond_kwargs={"text_embeds": text_embeds, "time_ids": time_ids})

    export_fn(unet_step,
              (unet.params, jnp.zeros((b, h, w, 4), jnp.bfloat16),
               jnp.zeros((b,), jnp.float32),
               jnp.zeros((b, 77, ctx_dim), jnp.bfloat16),
               jnp.zeros((b, text_dim), jnp.bfloat16),
               jnp.zeros((b, 6), jnp.bfloat16)),
              os.path.join(args.output, "unet_step.jaxexport"))

    def vae_decode(params, z):
        return vae.module.apply({"params": params}, z,
                                method=vae.module.decode)

    export_fn(vae_decode,
              (vae.params, jnp.zeros((args.batch, h, w, 4), jnp.float32)),
              os.path.join(args.output, "vae_decode.jaxexport"))
    print(f"exported unet_step + vae_decode to {args.output} "
          f"(quant={args.quant}, tome={args.tome})")


if __name__ == "__main__":
    main()
