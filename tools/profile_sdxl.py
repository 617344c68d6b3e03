"""Per-component SDXL UNet profiling on the real chip.

Methodology (see memory: axon-tpu-benchmarking): each op runs inside a jitted
fori_loop with a scalar carry chained through iterations (prevents hoisting),
timed by fetching the final scalar to host. Rates in TFLOP/s.
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, flops=None, label=""):
    def loop(s, *a):
        def body(i, s):
            out = fn(*jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a))
            leaf = jax.tree.leaves(out)[0]
            return s + leaf.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, s)

    run = jax.jit(loop)
    s = run(jnp.float32(0.0), *args)
    float(s)  # compile + fence
    t0 = time.time()
    s = run(jnp.float32(0.0), *args)
    float(s)
    dt = (time.time() - t0) / iters
    rate = (flops / dt / 1e12) if flops else 0.0
    print(f"{label:55s} {dt*1e3:8.3f} ms  {rate:7.1f} TFLOP/s")
    return dt


def attn_flops(b, h, s, sk, d):
    return 2 * 2 * b * h * s * sk * d  # QK^T + PV


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from paddlemix_tpu.ops import scaled_dot_product_attention

    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}")

    # reference: big matmul rate
    for mkn in [(8192, 8192, 8192)]:
        m, k, n = mkn
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        timed(lambda a, b: a @ b, a, b, flops=2 * m * k * n, label=f"matmul {mkn}")

    # SDXL transformer matmul shapes (batch 2 = CFG), M = B*S
    for (M, K, N) in [(8192, 640, 640), (8192, 640, 5120), (8192, 2560, 640),
                      (2048, 1280, 1280), (2048, 1280, 10240), (2048, 5120, 1280)]:
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, N), jnp.bfloat16)
        timed(lambda a, b: a @ b, a, b, flops=2 * M * K * N,
              label=f"matmul M={M} K={K} N={N}")

    # attention variants at the two SDXL levels
    for (B, S, H, D) in [(2, 4096, 10, 64), (2, 1024, 20, 64)]:
        q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        kk = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        fl = attn_flops(B, H, S, S, D)

        timed(scaled_dot_product_attention, q, kk, v, flops=fl,
              label=f"ours flash  B{B} S{S} H{H} D{D}")

        def xla_attn(q, k, v):
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            s_ = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (1.0 / np.sqrt(D))
            p = jax.nn.softmax(s_.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, vh).transpose(0, 2, 1, 3)

        timed(xla_attn, q, kk, v, flops=fl, label=f"xla attn    B{B} S{S} H{H} D{D}")

        try:
            timed(functools.partial(jax.nn.dot_product_attention, implementation="xla"),
                  q, kk, v, flops=fl, label=f"jax.nn dpa  B{B} S{S} H{H} D{D}")
        except Exception as e:
            print("jax.nn dpa failed:", e)

        # cross-attention shape (kv = 77 text tokens)
        kc = jax.random.normal(key, (B, 77, H, D), jnp.bfloat16)
        vc = jax.random.normal(key, (B, 77, H, D), jnp.bfloat16)
        timed(scaled_dot_product_attention, q, kc, vc,
              flops=attn_flops(B, H, S, 77, D), label=f"ours cross  B{B} S{S} kv77")
        timed(xla_attn, q, kc, vc,
              flops=attn_flops(B, H, S, 77, D), label=f"xla  cross  B{B} S{S} kv77")

    # fp32 vs bf16 layernorm cost at level-1 shape
    from flax import linen as nn
    x = jax.random.normal(key, (2, 4096, 640), jnp.bfloat16)
    ln = nn.LayerNorm(dtype=jnp.bfloat16)
    p = ln.init(key, x)
    timed(lambda x: ln.apply(p, x), x, label="layernorm (2,4096,640) bf16")

    # full UNet flops + step time
    from __graft_entry__ import SDXL_UNET, _unet
    unet = _unet(SDXL_UNET, jnp.bfloat16)
    lat = jax.random.normal(key, (2, 128, 128, 4), jnp.bfloat16)
    t = jnp.ones((2,), jnp.float32)
    ctx = jax.random.normal(key, (2, 77, 2048), jnp.bfloat16)
    te = jax.random.normal(key, (2, 1280), jnp.bfloat16)
    ti = jnp.ones((2, 6), jnp.bfloat16)

    def unet_fwd(params, lat, t, ctx, te, ti):
        return unet.module.apply({"params": params}, lat, t, ctx,
                                 added_cond_kwargs={"text_embeds": te, "time_ids": ti})

    lowered = jax.jit(unet_fwd).lower(unet.params, lat, t, ctx, te, ti)
    cost = lowered.compile().cost_analysis()
    ca = cost[0] if isinstance(cost, (list, tuple)) else cost
    fl = ca.get("flops", 0.0)
    print(f"UNet fwd (CFG batch2) flops from XLA: {fl/1e12:.3f} TFLOP")
    timed(unet_fwd, unet.params, lat, t, ctx, te, ti, iters=5, flops=fl,
          label="UNet fwd (CFG batch 2)")


if __name__ == "__main__":
    main()
