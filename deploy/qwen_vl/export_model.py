"""Export Qwen-VL (v1) for static-shape serving.

TPU counterpart of the reference's deploy/qwen_vl
(export_image_encoder.py + run_static_predict.py): AOT-serializes the
vision encoder+resampler (the piece the reference exports as a static
graph), the spliced prefill step, and the cached single-token decode step
via jax.export.

Usage:
  python deploy/qwen_vl/export_model.py --model-path <ckpt-dir> \
      --output ./qwenvl_export --batch 1 --prompt-len 320 --max-len 2048
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
    ap.add_argument("--output", default="./qwenvl_export")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=320)
    ap.add_argument("--max-len", type=int, default=2048)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.models.llama.modeling import KVCache
    from paddlemix_tpu.models.qwen_vl import QwenVLForConditionalGeneration

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    model = QwenVLForConditionalGeneration.from_pretrained(args.model_path)
    os.makedirs(args.output, exist_ok=True)
    model.save_pretrained(args.output)

    b, s = args.batch, args.prompt_len
    v = model.config.vision
    cache = model.init_cache(b, args.max_len)

    # the reference exports the image encoder alone
    # (export_image_encoder.py); here that is ViT + resampler
    def encode_images(params, pixel_values):
        return model.module.apply({"params": params}, pixel_values,
                                  method=model.module.encode_images)

    export_fn(encode_images,
              (model.params,
               jnp.zeros((b, v.image_size, v.image_size, 3), jnp.float32)),
              os.path.join(args.output, "image_encoder.jaxexport"))

    def prefill(params, input_ids, pixel_values, positions, ck, cv, lengths):
        logits, new_cache = model.module.apply(
            {"params": params}, input_ids, pixel_values, positions,
            cache=KVCache(ck, cv, lengths))
        return logits, new_cache.k, new_cache.v, new_cache.lengths

    export_fn(prefill,
              (model.params, jnp.zeros((b, s), jnp.int32),
               jnp.zeros((b, v.image_size, v.image_size, 3), jnp.float32),
               jnp.zeros((b, s), jnp.int32), cache.k, cache.v, cache.lengths),
              os.path.join(args.output, "prefill.jaxexport"))

    def decode(params, token, pos, ck, cv, lengths):
        logits, new_cache = model.module.apply(
            {"params": params}, token, None, pos,
            cache=KVCache(ck, cv, lengths))
        return logits, new_cache.k, new_cache.v, new_cache.lengths

    export_fn(decode,
              (model.params, jnp.zeros((b, 1), jnp.int32),
               jnp.zeros((b, 1), jnp.int32), cache.k, cache.v, cache.lengths),
              os.path.join(args.output, "decode.jaxexport"))
    print(f"exported weights + image-encoder/prefill/decode to {args.output}")


if __name__ == "__main__":
    main()
