"""Music generation demo (reference applications/MusicGeneration, AudioLDM2)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="upbeat electronic music with drums")
    ap.add_argument("--output", default="music.npy")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    app = Appflow(app="music_generation")
    result = app(prompt=args.prompt, num_inference_steps=args.steps)
    audio = np.asarray(result["result"])
    np.save(args.output, audio)
    print(f"saved waveform {audio.shape} -> {args.output}")


if __name__ == "__main__":
    main()
