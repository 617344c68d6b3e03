"""Text-guided image-to-image demo (reference applications/image2image)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--model", default=None,
                    help="img2img pipeline checkpoint dir")
    ap.add_argument("--strength", type=float, default=0.75)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--output", default="out.png")
    args = ap.parse_args()

    from PIL import Image

    from paddlemix_tpu.diffusers import StableDiffusionImg2ImgPipeline

    image = np.asarray(Image.open(args.image).convert("RGB"))
    pipe = StableDiffusionImg2ImgPipeline.from_pretrained(args.model) \
        if args.model else None
    app = Appflow(app="image2image_generation", models=[pipe])
    out = app(prompt=args.prompt, image=image, strength=args.strength,
              num_inference_steps=args.steps)["result"]
    arr = np.asarray(out)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)
                    if arr.dtype != np.uint8 else arr).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
