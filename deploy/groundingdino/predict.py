"""GroundingDINO static predictor.

TPU counterpart of the reference's deploy/groundingdino/predict.py: load the
AOT export, tokenize the text prompt (WordPiece/HF tokenizer at the export
dir), resize-pad the image to the exported canvas, threshold boxes.

Usage:
  python deploy/groundingdino/predict.py --export-dir ./gdino_export \
      --image img.jpg --prompt "a cat" --box-threshold 0.3
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
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--box-threshold", type=float, default=0.3)
    ap.add_argument("--text-len", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=800)
    args = ap.parse_args()

    from PIL import Image

    from paddlemix_tpu.deploy import load_fn
    from paddlemix_tpu.models.groundingdino import GroundingDinoModel
    from paddlemix_tpu.processors import GroundingDinoTextProcessor
    from paddlemix_tpu.utils.tokenizer import load_tokenizer

    model = GroundingDinoModel.from_pretrained(args.export_dir)
    fn = load_fn(os.path.join(args.export_dir, "gdino.jaxexport"))
    tok = load_tokenizer(args.export_dir)

    caption = GroundingDinoTextProcessor.pre_caption(args.prompt)
    ids = tok.encode(caption)[: args.text_len]
    input_ids = np.zeros((1, args.text_len), np.int32)
    input_ids[0, : len(ids)] = ids

    image = np.asarray(Image.open(args.image).convert("RGB"), np.float32)
    h, w = image.shape[:2]
    s = args.image_size
    scale = s / max(h, w)
    th, tw = int(round(h * scale)), int(round(w * scale))
    resized = np.asarray(Image.fromarray(image.astype(np.uint8)).resize(
        (tw, th), Image.BILINEAR), np.float32) / 255.0
    canvas = np.zeros((1, s, s, 3), np.float32)
    canvas[0, :th, :tw] = resized

    boxes, scores = fn(model.params, canvas, input_ids)
    boxes, scores = np.asarray(boxes)[0], np.asarray(scores)[0]
    keep = scores >= args.box_threshold
    # cxcywh in canvas fraction -> xyxy pixels in the original image
    out = []
    for (cx, cy, bw, bh), sc in zip(boxes[keep], scores[keep]):
        x0 = (cx - bw / 2) * s / scale
        y0 = (cy - bh / 2) * s / scale
        x1 = (cx + bw / 2) * s / scale
        y1 = (cy + bh / 2) * s / scale
        out.append({"box": [round(float(v), 1) for v in (x0, y0, x1, y1)],
                    "score": round(float(sc), 4)})
    print(out)


if __name__ == "__main__":
    main()
