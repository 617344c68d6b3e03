"""Generate tests/golden_diffusion.npz — frozen output slices for the
diffusion-model golden tests (run once; see test_golden_diffusion.py).

Regenerate ONLY when an intentional numerical change is made, and re-verify
checkpoint parity afterwards: `python tests/golden_gen.py`."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from test_golden_diffusion import compute_outputs  # noqa: E402


def main():
    out = compute_outputs()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden_diffusion.npz")
    np.savez(path, **out)
    for k, v in out.items():
        print(k, v.shape, float(np.abs(v).mean()))
    print("wrote", path)


if __name__ == "__main__":
    main()
