"""Export SAM for static-shape serving.

TPU counterpart of the reference's deploy/sam/export.py (paddle
jit.to_static over SamModel with a fixed input spec): AOT-serialize the
jitted image+prompt -> (masks, iou) computation via jax.export for one of
the reference's input types (points / boxs / points_grid).

Usage:
  python deploy/sam/export_model.py --model-path <ckpt-dir> \
      --input-type points --output ./sam_export
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
    ap.add_argument("--input-type", choices=["points", "boxs", "points_grid"],
                    default="points")
    ap.add_argument("--output", default="./sam_export")
    ap.add_argument("--num-points", type=int, default=1)
    ap.add_argument("--num-boxes", type=int, default=1)
    ap.add_argument("--grid-side", type=int, default=8,
                    help="points_grid exports a side*side point grid")
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import enable_compilation_cache, export_fn
    from paddlemix_tpu.models.sam import SamModel

    enable_compilation_cache(os.path.join(args.output, "jax_cache"))
    model = SamModel.from_pretrained(args.model_path)
    os.makedirs(args.output, exist_ok=True)
    model.save_pretrained(args.output)
    s = model.config.image_size
    px = jnp.zeros((1, s, s, 3), jnp.float32)

    if args.input_type == "boxs":
        def fn(params, pixel_values, boxes):
            return model.module.apply({"params": params}, pixel_values,
                                      boxes=boxes)
        # boxes ride as (B, 2, 2) corner pairs per box
        example = (model.params, px,
                   jnp.zeros((args.num_boxes, 2, 2), jnp.float32))
    else:
        n = args.num_points if args.input_type == "points" \
            else args.grid_side ** 2

        def fn(params, pixel_values, points, labels):
            return model.module.apply({"params": params}, pixel_values,
                                      points=points, point_labels=labels)
        example = (model.params, px, jnp.zeros((1, n, 2), jnp.float32),
                   jnp.ones((1, n), jnp.int32))

    export_fn(fn, example,
              os.path.join(args.output, f"sam_{args.input_type}.jaxexport"))
    print(f"exported weights + {args.input_type} computation to {args.output}")


if __name__ == "__main__":
    main()
