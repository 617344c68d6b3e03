"""Automatic labeling demo (reference applications/Automatic_label):
GroundingDINO open-set detection -> SAM masks -> per-box captions."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="all objects")
    args = ap.parse_args()

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    app = Appflow(app="automatic_label")
    result = app(image=image, prompt=args.prompt)
    for k in ("boxes", "labels", "masks", "captions"):
        if k in result:
            v = result[k]
            print(k, getattr(v, "shape", v))


if __name__ == "__main__":
    main()
