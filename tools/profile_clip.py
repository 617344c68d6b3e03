"""Per-op TPU profile of the CLIP bench forward (VERDICT r4 weak-4: find the
missing two-thirds of MFU).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_clip.py [batch]
"""

import glob
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    trace_dir = "/tmp/clip_trace"

    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        vision_config=dict(hidden_size=768, intermediate_size=3072,
                           num_hidden_layers=12, num_attention_heads=12,
                           image_size=224, patch_size=16),
        text_config=dict(hidden_size=512, intermediate_size=2048,
                         num_hidden_layers=12, num_attention_heads=8,
                         max_position_embeddings=77),
        projection_dim=512,
    )
    model = CLIPModel(cfg, dtype=jnp.bfloat16)
    import jax.random as jr

    args, kwargs = CLIPModel.example_inputs(cfg)
    shapes = jax.eval_shape(
        lambda: model.module.init(jr.PRNGKey(0), *args, **kwargs))["params"]
    model.params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda l: jnp.full(l.shape, 0.02, l.dtype), shapes))()

    px = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    ids = jnp.ones((batch, 77), jnp.int32)

    @jax.jit
    def fwd(params, px, ids):
        def body(i, acc):
            img, txt, scale = model.module.apply({"params": params}, px, ids)
            return acc + (scale * img @ txt.T)[0, 0]
        return jax.lax.fori_loop(0, 4, body, jnp.float32(0))

    t0 = time.time()
    np.asarray(fwd(model.params, px, ids))
    print(f"# compile+run {time.time()-t0:.0f}s", file=sys.stderr)
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fwd(model.params, px, ids))
        ts.append(time.time() - t0)
    print(f"# wall {np.median(ts)/4*1e3:.1f} ms/fwd (batch {batch})")

    with jax.profiler.trace(trace_dir):
        np.asarray(fwd(model.params, px, ids))

    planes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if planes:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_sdxl import summarize_xplane

        summarize_xplane(planes[-1], steps=4)


if __name__ == "__main__":
    main()
