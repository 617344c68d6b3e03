"""Export GroundingDINO for static-shape serving.

TPU counterpart of the reference's deploy/groundingdino/export.py:
AOT-serialize the jitted (pixel_values, input_ids) -> (boxes, scores)
computation at a fixed image canvas and token length.

Usage:
  python deploy/groundingdino/export_model.py --model-path <ckpt-dir> \
      --output ./gdino_export --image-size 800 --text-len 16
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
    ap.add_argument("--output", default="./gdino_export")
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--text-len", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.models.groundingdino import GroundingDinoModel

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    model = GroundingDinoModel.from_pretrained(args.model_path)
    os.makedirs(args.output, exist_ok=True)
    model.save_pretrained(args.output)
    import shutil

    for name in ("vocab.txt", "tokenizer.json", "vocab.json", "merges.txt",
                 "tokenizer_config.json"):
        src = os.path.join(args.model_path, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.output, name))

    def fn(params, pixel_values, input_ids):
        out = model.module.apply({"params": params}, pixel_values, input_ids)
        import jax

        scores = jax.nn.sigmoid(out["pred_logits"]).max(-1)
        return out["pred_boxes"], scores

    s = args.image_size
    export_fn(fn, (model.params, jnp.zeros((1, s, s, 3), jnp.float32),
                   jnp.ones((1, args.text_len), jnp.int32)),
              os.path.join(args.output, "gdino.jaxexport"))
    print(f"exported weights + detection computation to {args.output}")


if __name__ == "__main__":
    main()
