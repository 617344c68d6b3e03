"""Text-guided inpainting demo (reference applications/Inpainting):
detect the region by prompt -> SAM mask -> SD inpaint with a new prompt."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="dog", help="what to find")
    ap.add_argument("--inpaint-prompt", default="a cat", help="what to paint")
    ap.add_argument("--output", default="inpainted.png")
    args = ap.parse_args()

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    app = Appflow(app="inpainting")
    result = app(image=image, prompt=args.prompt,
                 inpaint_prompt=args.inpaint_prompt)
    arr = np.asarray(result["result"])
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray((arr * 255).astype(np.uint8)).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
