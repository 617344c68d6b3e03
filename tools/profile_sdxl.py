"""Capture a TPU profile of the SDXL UNet denoise step and print top ops.

Usage: python tools/profile_sdxl.py [trace_dir]
Parses the captured xplane with xprof's raw_to_tool_data to rank HLO ops by
self time — the measurement base for kernel-level optimization decisions.
"""

import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import SDXL_UNET, _unet  # noqa: E402


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdxl_trace"
    batch = int(os.environ.get("BENCH_BATCH", 1))
    lat = 128

    unet = _unet(SDXL_UNET, jnp.bfloat16)
    context = jax.random.normal(jax.random.PRNGKey(2), (2 * batch, 77, 2048), jnp.bfloat16)
    text_embeds = jax.random.normal(jax.random.PRNGKey(3), (2 * batch, 1280), jnp.bfloat16)
    time_ids = jnp.tile(jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.bfloat16), (2 * batch, 1))
    lat_in = jax.random.normal(jax.random.PRNGKey(4), (2 * batch, lat, lat, 4), jnp.bfloat16)

    @jax.jit
    def step(params, lat_in):
        def body(i, x):
            noise = unet.module.apply(
                {"params": params}, x, jnp.asarray(500),
                context, added_cond_kwargs={"text_embeds": text_embeds,
                                            "time_ids": time_ids})
            return x + 0.0 * noise  # keep loop-carried dep without changing cost
        return jax.lax.fori_loop(0, 4, body, lat_in)

    out = step(unet.params, lat_in)
    np.asarray(out[0, :2, :2, 0])  # compile + fence

    with jax.profiler.trace(trace_dir):
        out = step(unet.params, lat_in)
        np.asarray(out[0, :2, :2, 0])

    # locate the xplane file and convert to op_profile/hlo stats
    planes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print(f"# captured {planes}")
    if not planes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    csv, _ = raw_to_tool_data.xspace_to_tool_data(planes, "framework_op_stats^", {})
    lines = csv.decode() if isinstance(csv, bytes) else str(csv)
    rows = lines.splitlines()
    import csv as csvmod
    r = list(csvmod.reader(rows))
    hdr = r[0]
    print("\t".join(hdr[:10]))
    # rank by total self time
    try:
        ti = hdr.index("total_self_time")
    except ValueError:
        ti = 3
    body_rows = sorted(r[1:], key=lambda x: -float(x[ti]) if x[ti] else 0)
    for row in body_rows[:40]:
        print("\t".join(row[:10]))


if __name__ == "__main__":
    main()
