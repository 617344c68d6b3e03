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

    # BENCH_QUANT=a8w8_static profiles the DEFAULT bench mode, reusing the
    # calibrated-scales cache bench.py writes (same model identity)
    quant = os.environ.get("BENCH_QUANT", "")
    cfg = dict(SDXL_UNET)
    quant_ctx = None
    if quant == "a8w8_static":
        cfg["quant"] = "a8w8_static"
        scale_files = glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_scales_sdxl_1024_1_*.npy"))
        assert scale_files, "run `python bench.py` once to cache the scales"
        scales = np.load(sorted(scale_files)[-1])
        from paddlemix_tpu.ops.quant import static_a8w8_scope

        quant_ctx = static_a8w8_scope("apply", [float(v) for v in scales])
        print(f"# a8w8 static profile: {len(scales)} scales "
              f"(fused_resnet={os.environ.get('PMIX_FUSED_RESNET', '0')})")
    unet = _unet(cfg, jnp.bfloat16)
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

    import contextlib

    with (quant_ctx or contextlib.nullcontext()):  # active during trace
        out = step(unet.params, lat_in)
    np.asarray(out[0, :2, :2, 0])  # compile + fence

    with jax.profiler.trace(trace_dir):
        out = step(unet.params, lat_in)
        np.asarray(out[0, :2, :2, 0])

    # locate the newest xplane file and aggregate op self-times directly from
    # the proto (the tensorboard_plugin_profile converter needs a native
    # _pywrap_profiler symbol this image lacks; the xplane itself is just a
    # protobuf — run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the
    # fast-proto descriptor check rejects the generated module)
    planes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    print(f"# captured {planes}")
    if not planes:
        return
    summarize_xplane(planes[-1])


def summarize_xplane(path, steps=4, top=25):
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "TPU" in p.name or "device" in p.name.lower())
    md, smd = plane.event_metadata, plane.stat_metadata
    line = next(l for l in plane.lines if l.name == "XLA Ops")
    dur = collections.Counter()
    cnt = collections.Counter()
    cat_of = {}
    for ev in line.events:
        m = md[ev.metadata_id]
        dur[m.name] += ev.duration_ps
        cnt[m.name] += 1
        if m.name not in cat_of:
            for st in list(ev.stats) + list(m.stats):
                if smd[st.metadata_id].name == "hlo_category":
                    cat_of[m.name] = st.str_value
    # the outermost while's self time spans its body; drop it from totals
    inner = {n: d for n, d in dur.items() if cat_of.get(n) != "while"}
    total = sum(inner.values())
    print(f"# inner-op time: {total / 1e12 * 1000:.1f} ms "
          f"(~{total / 1e12 * 1000 / steps:.1f} ms/step over {steps} steps)")
    bycat = collections.Counter()
    for n, d in inner.items():
        bycat[cat_of.get(n, "?")] += d
    print("# -- by category (per step) --")
    for c, d in bycat.most_common(12):
        print(f"#  {d / total * 100:5.1f}%  {d / 1e12 * 1000 / steps:8.2f} ms  {c}")
    print("# -- top ops (per step) --")
    for n, d in sorted(inner.items(), key=lambda kv: -kv[1])[:top]:
        print(f"#  {d / 1e12 * 1000 / steps:7.3f} ms x{cnt[n]:<4} "
              f"[{cat_of.get(n, '?')}] {n[:120]}")


if __name__ == "__main__":
    main()
