"""CV-in-the-Wild demo (reference applications/CVinW): open-set detection +
segmentation by free-text prompt (GroundingDINO -> SAM)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="dog . cat . person")
    args = ap.parse_args()

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    app = Appflow(app="openset_det_sam")
    result = app(image=image, prompt=args.prompt)
    print("boxes:", getattr(result.get("boxes"), "shape", None))
    print("masks:", getattr(result.get("masks"), "shape", None))


if __name__ == "__main__":
    main()
