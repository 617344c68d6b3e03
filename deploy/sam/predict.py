"""SAM static predictor.

TPU counterpart of the reference's deploy/sam/predict.py: load the
AOT-exported computation (no tracing in the serving process), preprocess
with SamProcessor, postprocess masks back to the original resolution.

Usage:
  python deploy/sam/predict.py --export-dir ./sam_export \
      --image img.jpg --input-type points --points 300,400
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export-dir", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--input-type", choices=["points", "boxs"],
                    default="points")
    ap.add_argument("--points", type=str, default=None,
                    help="x,y[;x,y...] in original image coordinates")
    ap.add_argument("--box", type=str, default=None, help="x0,y0,x1,y1")
    ap.add_argument("--output", default="masks.npy")
    args = ap.parse_args()

    from PIL import Image

    from paddlemix_tpu.deploy import load_fn
    from paddlemix_tpu.models.sam import SamModel
    from paddlemix_tpu.processors import SamProcessor

    from paddlemix_tpu.processors import SamImageProcessor

    model = SamModel.from_pretrained(args.export_dir)
    fn = load_fn(os.path.join(args.export_dir,
                              f"sam_{args.input_type}.jaxexport"))
    proc = SamProcessor(image_processor=SamImageProcessor(
        size=model.config.image_size))

    image = np.asarray(Image.open(args.image).convert("RGB"))
    point_coords = point_labels = box = None
    if args.input_type == "points":
        pts = [tuple(map(float, p.split(","))) for p in args.points.split(";")]
        point_coords = np.asarray(pts)
        point_labels = np.ones(len(pts), np.int32)
    else:
        x0, y0, x1, y1 = map(float, args.box.split(","))
        box = np.asarray([[x0, y0, x1, y1]])
    enc = proc(image, input_type=args.input_type, point_coords=point_coords,
               point_labels=point_labels, box=box)
    if args.input_type == "points":
        masks, iou = fn(model.params, enc["pixel_values"],
                        enc["point_coords"], enc["point_labels"])
    else:
        masks, iou = fn(model.params, enc["pixel_values"][0:1],
                        enc["boxes"][0].reshape(-1, 2, 2))
    full = proc.postprocess_masks(np.asarray(masks), enc["input_size"],
                                  enc["original_size"])
    np.save(args.output, full)
    print(f"masks {full.shape} iou={np.asarray(iou).round(3).tolist()} "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
