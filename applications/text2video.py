"""Text-to-video demo (reference applications/text2video)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--model", default=None,
                    help="text-to-video pipeline checkpoint dir")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--output", default="out.npy",
                    help=".npy frame stack (or .gif with PIL)")
    args = ap.parse_args()

    from paddlemix_tpu.diffusers import DiffusionPipeline

    pipe = DiffusionPipeline.from_pretrained(args.model) if args.model else None
    app = Appflow(app="text2video_generation", models=[pipe])
    frames = app(prompt=args.prompt, num_frames=args.frames,
                 num_inference_steps=args.steps)["result"]
    arr = np.asarray(frames)
    if args.output.endswith(".gif"):
        from PIL import Image

        stack = arr[0] if arr.ndim == 5 else arr
        imgs = [Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
                for f in stack]
        imgs[0].save(args.output, save_all=True, append_images=imgs[1:],
                     duration=125, loop=0)
    else:
        np.save(args.output, arr)
    print(f"saved {args.output} {arr.shape}")


if __name__ == "__main__":
    main()
