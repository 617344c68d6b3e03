"""Text-to-image with any diffusers-layout checkpoint (SD1.5/2.x/SDXL/SD3).

Usage: python examples/text_to_image.py /path/to/checkpoint "a prompt" out.png
(reference equivalent: ppdiffusers text_to_image inference examples)"""

import sys

from paddlemix_tpu.diffusers import DiffusionPipeline


def main():
    path, prompt = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "out.png"
    pipe = DiffusionPipeline.from_pretrained(path)
    images = pipe(prompt, num_inference_steps=25)[0]
    images[0].save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
