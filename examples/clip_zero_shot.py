"""CLIP zero-shot classification (reference paddlemix/examples/clip +
metrics/clip_zero_shot.py).

Usage: python examples/clip_zero_shot.py /path/to/clip image.jpg cat dog bird"""

import sys

from paddlemix_tpu.appflow import Appflow
from paddlemix_tpu.processors.image_utils import to_numpy_rgb


def main():
    path, image_path, *labels = sys.argv[1:]
    from PIL import Image

    app = Appflow(app="zero_shot_classification", models=[path])
    result = app(image=to_numpy_rgb(Image.open(image_path)), candidate_labels=labels)
    for r in result["result"]:
        print(f"{r['label']}: {r['score']:.4f}")


if __name__ == "__main__":
    main()
