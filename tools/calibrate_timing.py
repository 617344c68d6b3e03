"""Decompose axon-relay timing: T(iters) = c0 + iters * c1 for a few ops.

Chains the output back into the input (out[0,0]*1e-30 broadcast-add) so XLA
cannot hoist the body out of the fori_loop."""

import time
import jax
import jax.numpy as jnp
import numpy as np


def loop_time(fn, a, b, iters):
    def loop(a, b):
        def body(i, carry):
            a, s = carry
            out = fn(a + s, b)
            return a, out.reshape(-1)[0].astype(jnp.float32) * 1e-30
        _, s = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0.0)))
        return s

    run = jax.jit(loop)
    float(run(a, b))  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(run(a, b))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def probe(label, m, k, n, flops=None):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)
    fn = lambda a, b: a @ b
    t1 = loop_time(fn, a, b, 1)
    t20 = loop_time(fn, a, b, 20)
    t100 = loop_time(fn, a, b, 100)
    per = (t100 - t20) / 80
    fixed = t20 - 20 * per
    fl = flops or 2 * m * k * n
    print(f"{label:35s} T1={t1*1e3:7.2f}ms T20={t20*1e3:7.2f}ms "
          f"T100={t100*1e3:8.2f}ms per-iter={per*1e3:7.3f}ms "
          f"fixed={fixed*1e3:6.1f}ms rate={fl/per/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}")
    probe("matmul 8192^3", 8192, 8192, 8192)
    probe("matmul 4096^3", 4096, 4096, 4096)
    probe("matmul M8192 K640 N640", 8192, 640, 640)
    probe("matmul M8192 K640 N5120", 8192, 640, 5120)
    probe("matmul M2048 K1280 N1280", 2048, 1280, 1280)
