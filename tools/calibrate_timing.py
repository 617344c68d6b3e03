"""Trustworthy per-op timings on the axon-relay TPU.

Lessons encoded here (see memory axon-tpu-benchmarking):
- fixed dispatch overhead ~28-36 ms/call -> time T(N) and T(1), use the slope.
- the chained value must consume EVERY element of the op output through a
  nonlinearity (tanh), else XLA strength-reduces the op to the slice the
  carry needs (out[0,0] of a matmul becomes a dot product).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(make_body, iters_hi=50, iters_lo=1, reps=3):
    """Per-iteration seconds via (T(hi) - T(lo)) / (hi - lo)."""

    def run(iters):
        @jax.jit
        def loop(*args):
            def body(i, carry):
                return make_body(*args)(carry)
            out = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return out

        float(loop(*ARGS))  # compile + fence
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(loop(*ARGS))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    global ARGS
    t_hi = run(iters_hi)
    t_lo = run(iters_lo)
    return (t_hi - t_lo) / (iters_hi - iters_lo)


ARGS = ()


def timed(fn, *args, flops=None, bytes_moved=None, label="", iters=50):
    """fn(*args) -> array; every element of the output is consumed via tanh."""
    global ARGS
    ARGS = args

    def make_body(*a):
        def body(s):
            out = fn(*jax.tree.map(
                lambda x: (x + s.astype(x.dtype) * jnp.asarray(1e-30, x.dtype))
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaves = jax.tree.leaves(out)
            acc = jnp.float32(0.0)
            for l in leaves:
                acc += jnp.sum(jnp.tanh(l.astype(jnp.float32) * 1e-6))
            return s * 0 + acc * 1e-20
        return body

    dt = slope_time(make_body, iters_hi=iters, iters_lo=1)
    rate = (flops / dt / 1e12) if flops else 0.0
    bw = (bytes_moved / dt / 1e9) if bytes_moved else 0.0
    extra = f"{rate:7.1f} TFLOP/s" if flops else (f"{bw:7.1f} GB/s" if bytes_moved else "")
    print(f"{label:50s} {dt*1e3:8.3f} ms  {extra}", flush=True)
    return dt


def attn_flops(b, h, s, sk, d):
    return 2 * 2 * b * h * s * sk * d


def main():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from paddlemix_tpu.ops import scaled_dot_product_attention

    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # rooflines
    for n in (4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        timed(lambda a, b: a @ b, a, b, flops=2 * n ** 3, label=f"matmul {n}^3 bf16")
    x = jax.random.normal(key, (256 * 1024 * 1024 // 4,), jnp.float32)
    timed(lambda x: x * 1.000001, x, bytes_moved=2 * x.size * 4,
          label="copy 256MB fp32 (HBM BW)", iters=20)

    # SDXL transformer matmul shapes (batch 2 = CFG), tanh-consumed
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
            s_ = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (1.0 / np.sqrt(D))
            p = jax.nn.softmax(s_.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v)

        timed(xla_attn, q, kk, v, flops=fl, label=f"xla attn    B{B} S{S} H{H} D{D}")

        # head-packed: fold pairs of D=64 heads into the batch dim is free;
        # instead test D=128 packing via (B*H) batch and seq blocks
        kc = jax.random.normal(key, (B, 77, H, D), jnp.bfloat16)
        vc = jax.random.normal(key, (B, 77, H, D), jnp.bfloat16)
        timed(scaled_dot_product_attention, q, kc, vc,
              flops=attn_flops(B, H, S, 77, D), label=f"ours cross  B{B} S{S} kv77")
        timed(xla_attn, q, kc, vc,
              flops=attn_flops(B, H, S, 77, D), label=f"xla  cross  B{B} S{S} kv77")

    # GEGLU feed-forward at level-1 shape, fused as one jit
    from flax import linen as nn

    class FF(nn.Module):
        d: int

        @nn.compact
        def __call__(self, x):
            hg = nn.Dense(self.d * 8, dtype=jnp.bfloat16)(x)
            h, g = jnp.split(hg, 2, axis=-1)
            h = h * jax.nn.gelu(g)
            return nn.Dense(self.d, dtype=jnp.bfloat16)(x=h)

    for (B, S, C) in [(2, 4096, 640), (2, 1024, 1280)]:
        x = jax.random.normal(key, (B, S, C), jnp.bfloat16)
        ff = FF(C)
        p = ff.init(key, x)
        fl = 2 * B * S * C * (8 * C) + 2 * B * S * (4 * C) * C
        timed(lambda p, x: ff.apply(p, x), p, x, flops=fl,
              label=f"GEGLU FF ({B},{S},{C})")


if __name__ == "__main__":
    main()
