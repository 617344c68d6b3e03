"""Export Qwen2-VL for static-shape serving.

TPU counterpart of the reference's deploy/qwen2_vl (paddle static graph):
AOT-serializes the packed-vision + prefill step and the cached decode step.
Qwen2-VL's dynamic-resolution ViT packs patches into ONE flat sequence
(processors/qwen2_vl_processing.smart_resize), so a single (num_patches,)
bucket covers a range of image sizes — pick buckets per your serving mix.

Usage:
  python deploy/qwen2_vl/export_model.py --model-path <ckpt-dir> \
      --output ./qwen2vl_export --batch 1 --prompt-len 256 \
      --vision-patches 1024 --max-len 4096
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
    ap.add_argument("--output", default="./qwen2vl_export")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=256)
    ap.add_argument("--vision-patches", type=int, default=1024,
                    help="packed patch bucket (pad images up to this)")
    ap.add_argument("--max-len", type=int, default=4096)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.models.llama.modeling import KVCache
    from paddlemix_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    model = Qwen2VLForConditionalGeneration.from_pretrained(args.model_path)
    os.makedirs(args.output, exist_ok=True)
    model.save_pretrained(args.output)

    v = model.config.vision
    b, s, npatch = args.batch, args.prompt_len, args.vision_patches
    cache = model.init_cache(b, args.max_len)
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2

    def prefill(params, input_ids, position_ids, pixel_patches, patch_pos_hw,
                patch_segments, positions, ck, cv, lengths):
        logits, new_cache = model.module.apply(
            {"params": params}, input_ids, position_ids, pixel_patches,
            patch_pos_hw, patch_segments, positions=positions,
            cache=KVCache(ck, cv, lengths))
        return logits, new_cache.k, new_cache.v, new_cache.lengths

    export_fn(prefill,
              (model.params, jnp.zeros((b, s), jnp.int32),
               jnp.zeros((3, b, s), jnp.int32),          # M-RoPE streams
               jnp.zeros((1, npatch, patch_dim), jnp.float32),
               jnp.zeros((1, npatch, 2), jnp.int32),     # packed hw positions
               jnp.zeros((1, npatch), jnp.int32),        # packed segment ids
               jnp.zeros((b, s), jnp.int32),             # cache write positions
               cache.k, cache.v, cache.lengths),
              os.path.join(args.output, "prefill.jaxexport"))

    def decode(params, token, position_ids, pos, ck, cv, lengths):
        logits, new_cache = model.module.apply(
            {"params": params}, token, position_ids, positions=pos,
            cache=KVCache(ck, cv, lengths))
        return logits, new_cache.k, new_cache.v, new_cache.lengths

    export_fn(decode,
              (model.params, jnp.zeros((b, 1), jnp.int32),
               jnp.zeros((3, b, 1), jnp.int32),
               jnp.zeros((b, 1), jnp.int32), cache.k, cache.v,
               cache.lengths),
              os.path.join(args.output, "decode.jaxexport"))
    print(f"exported weights + prefill/decode to {args.output}")


if __name__ == "__main__":
    main()
