"""CLIP Interrogator demo CLI (reference ppdiffusers/examples/
clip_interrogator/run_cli.py): image -> prompt string for t2i models."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--clip", required=True,
                    help="CLIP checkpoint dir (model + processor)")
    ap.add_argument("--mode", choices=("fast", "classic"), default="fast")
    ap.add_argument("--data-path", default=None,
                    help="dir with mediums/artists/movements/trends/flavors.txt")
    args = ap.parse_args()

    from PIL import Image

    from paddlemix_tpu.models.clip import CLIPModel
    from paddlemix_tpu.processors.clip_processing import CLIPProcessor

    image = np.asarray(Image.open(args.image).convert("RGB"))
    clip = CLIPModel.from_pretrained(args.clip)
    processor = CLIPProcessor.from_pretrained(args.clip)
    app = Appflow(app="clip_interrogate", models=[(clip, processor)],
                  data_path=args.data_path)
    print(app(image=image, mode=args.mode)["result"])


if __name__ == "__main__":
    main()
