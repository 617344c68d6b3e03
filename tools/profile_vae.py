"""Per-op TPU profile of the SDXL VAE decode (the 114 ms/image tail).

The decoder's activation traffic + conv FLOPs put its roofline near ~20 ms
at 1024px on v5e, so 114 ms implies something pathological (layout copies,
fp32 upcasts, fusion breaks). This ranks HLO self-times to find it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_vae.py
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
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vae_trace"
    res = int(os.environ.get("BENCH_RES", 1024))
    lat = res // 8

    from paddlemix_tpu.diffusers.models import AutoencoderKL, AutoencoderKLConfig

    quant = os.environ.get("VAE_QUANT", "") == "1"   # bench's a8w8 decoder
    vae_cfg = AutoencoderKLConfig(sample_size=res, scaling_factor=0.13025,
                                  quant="a8w8_static" if quant else None)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    v_args, v_kwargs = AutoencoderKL.example_inputs(vae_cfg)
    v_shapes = jax.eval_shape(
        lambda: vae.module.init(jax.random.PRNGKey(0), *v_args, **v_kwargs))["params"]
    vae.params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda l: jnp.full(l.shape, 0.02, jnp.bfloat16), v_shapes))()

    latents = jax.random.normal(jax.random.PRNGKey(1), (1, lat, lat, 4),
                                jnp.bfloat16)

    @jax.jit
    def step(params, z):
        def body(i, z):
            img = vae.module.apply({"params": params}, z,
                                   method=vae.module.decode)
            return z + (0.0 * jnp.sum(img)).astype(z.dtype)
        return jax.lax.fori_loop(0, 4, body, z)

    import contextlib

    quant_ctx = contextlib.nullcontext()
    if quant:
        from paddlemix_tpu.ops.quant import static_a8w8_scope

        def calib(params, z):
            with static_a8w8_scope("record") as ctx:
                vae.module.apply({"params": params}, z, method=vae.module.decode)
            return jnp.stack(ctx.scales)

        scales = np.asarray(jax.jit(calib)(vae.params, latents))
        print(f"# calibrated {len(scales)} ops")
        # fori_loop body traces ONCE -> one pass over the scale list
        quant_ctx = static_a8w8_scope("apply", [float(v) for v in scales])

    t0 = time.time()
    with quant_ctx:
        out = step(vae.params, latents)
    np.asarray(out[0, :2, :2, 0])
    print(f"# compile+first {time.time()-t0:.0f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = step(vae.params, latents)
        np.asarray(out[0, :2, :2, 0])
        ts.append(time.time() - t0)
    print(f"# wall {np.median(ts)/4*1e3:.1f} ms/decode (4 decodes/call)")

    with jax.profiler.trace(trace_dir):
        out = step(vae.params, latents)
        np.asarray(out[0, :2, :2, 0])

    planes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    print(f"# captured {planes}")
    if planes:
        from profile_sdxl import summarize_xplane

        summarize_xplane(planes[-1], steps=4)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
