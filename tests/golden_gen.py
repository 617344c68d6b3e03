"""Generate tests/golden_diffusion.npz — frozen output slices for the
diffusion-model golden tests (run once; see test_golden_diffusion.py).

Regenerate ONLY when an intentional numerical change is made, and re-verify
checkpoint parity afterwards: `python tests/golden_gen.py`.

Provenance: the goldens are CPU-backend outputs of this repo's implementation
(regression pins, not independent correctness proof). Independent correctness
for the same blocks lives in tests/test_torch_reference_diffusion.py, which
re-implements the reference math (ppdiffusers/models/unet_2d_blocks.py et al.)
in torch inside the test and asserts parity through the conversion path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin the CPU backend in-process (the sandbox sitecustomize registers the TPU
# `axon` plugin before env vars are honored — same dance as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge  # noqa: E402

if hasattr(xla_bridge, "_clear_backends"):
    xla_bridge._clear_backends()
assert jax.default_backend() == "cpu", jax.default_backend()

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
