"""GroundingDINO-T latency on one TPU chip (VERDICT r4 weak-7: the XLA
ms_deform_attn path had never been timed — is the appflow openset_det_sam
task usable?).

Full-size gdino-T geometry (Swin-T backbone, 6+6 layer transformer, 900
queries) at 800px, jitted end-to-end, slope-timed via a fori_loop twin.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gdino.py [res]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 800

    from paddlemix_tpu.models.groundingdino import (
        GroundingDinoConfig,
        GroundingDinoModel,
    )

    # gdino-T: Swin-T (embed 96, depths 2/2/6/2), 256-d transformer
    cfg = GroundingDinoConfig(
        swin_config=dict(patch_size=4, embed_dim=96, depths=(2, 2, 6, 2),
                         num_heads=(3, 6, 12, 24), window_size=7,
                         out_indices=(1, 2, 3)),
        text_layers=6, text_heads=8)
    model = GroundingDinoModel.from_config(cfg, seed=0)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(model.params))
    print(f"# params: {n_params/1e6:.1f}M", file=sys.stderr)

    px = jnp.zeros((1, res, res, 3), jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(1000, 2000, (1, 16)),
                      jnp.int32)

    def make(n):
        @jax.jit
        def run(params, px, ids):
            def body(i, acc):
                out = model.module.apply({"params": params}, px, ids)
                return acc + out["pred_boxes"][0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    run1, run4 = make(1), make(4)
    t0 = time.time()
    np.asarray(run1(model.params, px, ids))
    print(f"# compile {time.time()-t0:.0f}s", file=sys.stderr)
    np.asarray(run4(model.params, px, ids))

    def med(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(fn(model.params, px, ids))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t1, t4 = med(run1), med(run4)
    per = (t4 - t1) / 3
    print(f"# t1={t1*1e3:.1f}ms t4={t4*1e3:.1f}ms")
    print(f"gdino_t_{res}px_latency_ms: {per*1e3:.1f} (slope), "
          f"{1.0/per:.2f} img/s")


if __name__ == "__main__":
    main()
