"""Export SD3 for static-shape serving.

TPU counterpart of the reference's ppdiffusers/deploy/sd3/export_model.py:
serializes the MM-DiT CFG denoise step and the VAE decoder as jax.export
computations at a fixed resolution, plus the weights.

Usage:
  python deploy/sd3/export_model.py --model-path <pipeline-dir> \
      --output ./sd3_export --height 1024 --width 1024
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
    ap.add_argument("--output", default="./sd3_export")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--text-len", type=int, default=154,
                    help="joint text length (CLIP 77 + T5 77 by default)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        SD3Transformer2DModel,
    )

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    transformer = SD3Transformer2DModel.from_pretrained(
        args.model_path, subfolder="transformer")
    vae = AutoencoderKL.from_pretrained(args.model_path, subfolder="vae")

    os.makedirs(args.output, exist_ok=True)
    transformer.save_pretrained(os.path.join(args.output, "transformer"))
    vae.save_pretrained(os.path.join(args.output, "vae"))

    cfg = transformer.config
    h = args.height // 8
    w = args.width // 8
    b = args.batch * 2  # CFG pair

    def dit_step(params, latents, t, encoder_hidden, pooled):
        return transformer.module.apply({"params": params}, latents, t,
                                        encoder_hidden, pooled)

    export_fn(dit_step,
              (transformer.params,
               jnp.zeros((b, h, w, cfg.in_channels), jnp.bfloat16),
               jnp.zeros((b,), jnp.float32),
               jnp.zeros((b, args.text_len, cfg.joint_attention_dim),
                         jnp.bfloat16),
               jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)),
              os.path.join(args.output, "dit_step.jaxexport"))

    def vae_decode(params, z):
        return vae.module.apply({"params": params}, z,
                                method=vae.module.decode)

    export_fn(vae_decode,
              (vae.params,
               jnp.zeros((args.batch, h, w, cfg.in_channels), jnp.float32)),
              os.path.join(args.output, "vae_decode.jaxexport"))
    print(f"exported dit_step + vae_decode to {args.output}")


if __name__ == "__main__":
    main()
