"""Text-to-image demo app (reference applications/text2image)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a photo of an astronaut riding a horse")
    ap.add_argument("--model", default=None, help="pipeline checkpoint dir")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--output", default="out.png")
    args = ap.parse_args()

    app = Appflow(app="text2image_generation",
                  models=[args.model] if args.model else None)
    result = app(prompt=args.prompt, num_inference_steps=args.steps)
    image = result["result"]
    arr = np.asarray(image)
    try:
        from PIL import Image

        if arr.ndim == 4:
            arr = arr[0]
        Image.fromarray((arr * 255).astype(np.uint8)).save(args.output)
        print(f"saved {args.output}")
    except ImportError:
        np.save(args.output + ".npy", arr)
        print(f"saved {args.output}.npy")


if __name__ == "__main__":
    main()
