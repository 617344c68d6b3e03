"""Multi-turn VLM chat demo (reference applications/VLChat): keep the
conversation history in the prompt, one image per session."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--model", default=None, help="VLM checkpoint dir")
    ap.add_argument("--max-turns", type=int, default=0,
                    help="0 = interactive until EOF")
    args = ap.parse_args()

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    app = Appflow(app="image2text_generation",
                  models=[args.model] if args.model else None)

    history = []
    turn = 0
    print("VLChat — ask about the image (Ctrl-D to quit)")
    while True:
        if args.max_turns and turn >= args.max_turns:
            break
        try:
            user = input("USER: ").strip()
        except EOFError:
            break
        if not user:
            continue
        prompt = "".join(f"USER: {u}\nASSISTANT: {a}\n" for u, a in history)
        prompt += f"USER: {user}\nASSISTANT:"
        answer = app(image=image, prompt=prompt)["result"]
        print(f"ASSISTANT: {answer}")
        history.append((user, str(answer)))
        turn += 1


if __name__ == "__main__":
    main()
