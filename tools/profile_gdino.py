"""Measure GroundingDINO end-to-end TPU latency (open-set detection).

The reference ships GroundingDINO behind a CUDA ms_deformable_attn op and a
Paddle static deploy (deploy/groundingdino/); here the deformable sampler is
the XLA gather/bilinear form (ops/ms_deform_attn.py), so this is the owed
measurement that the appflow openset_det_sam task is actually usable on TPU.

Usage: PYTHONPATH=.:/root/.axon_site python tools/profile_gdino.py
Prints ms/image for the full Swin-T + 6-enc/6-dec + 900-query forward at an
800x800 canvas, batch 1, bf16, random weights (latency is value-independent).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from paddlemix_tpu.models.groundingdino import (
        GroundingDinoConfig,
        GroundingDinoModel,
    )

    size = int(os.environ.get("BENCH_IMG", 800))
    text_len = int(os.environ.get("BENCH_TEXT", 16))
    cfg = GroundingDinoConfig()
    model = GroundingDinoModel(cfg, dtype=jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda: model.module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3), jnp.bfloat16),
            jnp.ones((1, text_len), jnp.int32)))["params"]
    model.params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda l: jnp.full(l.shape, 0.02, jnp.bfloat16 if l.dtype == jnp.float32
                           else l.dtype), shapes))()

    px = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    ids = jnp.ones((1, text_len), jnp.int32)

    @jax.jit
    def fwd(params, px, ids):
        out = model.module.apply({"params": params}, px, ids)
        return out["pred_boxes"], out["pred_logits"]

    t0 = time.time()
    boxes, logits = fwd(model.params, px, ids)
    np.asarray(boxes[0, 0, 0])
    compile_s = time.time() - t0

    reps = int(os.environ.get("BENCH_REPS", 10))
    times = []
    for _ in range(reps):
        t0 = time.time()
        boxes, logits = fwd(model.params, px, ids)
        np.asarray(boxes[0, 0, 0])
        times.append(time.time() - t0)
    ms = float(np.median(times)) * 1e3
    print(f"# gdino swin-t {size}px text_len={text_len} 900q: "
          f"{ms:.1f} ms/image (median of {reps}; compile {compile_s:.0f}s; "
          f"min {min(times)*1e3:.1f} ms) device={jax.devices()[0]}")


if __name__ == "__main__":
    main()
