"""Image-to-text (caption / VQA) demo app (reference applications/image2text)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="describe the image")
    ap.add_argument("--model", default=None)
    args = ap.parse_args()

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    app = Appflow(app="image2text_generation",
                  models=[args.model] if args.model else None)
    result = app(image=image, prompt=args.prompt)
    print(result["result"])


if __name__ == "__main__":
    main()
