"""Weight-only int8 quantized matmul.

TPU-native equivalent of the reference's triton weight_only_int8 kernel
(paddlemix/triton_ops/triton_ops.py:464): activations stay bf16/fp32, weights
are int8 with a per-output-channel fp scale; dequantize fused into the matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode, use_pallas


def quantize_weights_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: (in, out) -> (int8 weights, per-out-channel fp32 scales)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_tree_wint8(params, min_bytes: int = 1 << 20):
    """Walk a flax params tree; replace every 2D ``kernel`` leaf larger than
    ``min_bytes`` with ``kernel_q`` (int8) + ``scale`` (per-out-channel fp32).

    The consuming module must declare the matching wint8 params (see
    ``models/llama/modeling.py:MXUDense``). Embeddings, biases, norms and
    conv kernels (ndim != 2) are left untouched. TPU rationale: decode is
    weight-HBM-bandwidth-bound; int8 weights halve the bytes per token
    (reference counterpart: paddlenlp_ops weight-only int8 decode, SURVEY.md
    §2.4 item 6)."""
    # per-leaf jit with donation: the bf16 kernel's HBM is released as soon as
    # its int8 replacement exists, so peak memory is params + ONE weight, not
    # 1.5x the whole tree (a 7B model does not fit twice in 16 GB HBM)
    quant_one = jax.jit(quantize_weights_int8, donate_argnums=0)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict) and "kernel" in child \
                    and getattr(child["kernel"], "ndim", 0) == 2 \
                    and child["kernel"].size * 2 >= min_bytes:
                w = jnp.asarray(child["kernel"])
                q, scale = quant_one(w)
                jax.block_until_ready(q)
                if hasattr(w, "delete") and not w.is_deleted():
                    w.delete()  # some backends ignore donation; free explicitly
                rest = {k: v for k, v in child.items() if k != "kernel"}
                out[name] = {"kernel_q": q, "scale": scale, **walk(rest)}
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def wint8_matmul_xla(x, wq, scale):
    out = jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (out * scale).astype(x.dtype)


def _wint8_kernel(x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = wq_ref[...].astype(jnp.bfloat16)  # dequant-on-the-fly (int8 -> bf16)
    acc_ref[...] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def wint8_matmul(x, wq, scale, *, block_m: int = 256, block_n: int = 256, block_k: int = 512):
    """x: (..., K) @ wq: (K, N) int8, scale: (N,) -> (..., N)."""
    orig_shape = x.shape
    k, n = wq.shape
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]
    if not use_pallas() or m % 8 != 0 or k % 128 != 0 or n % 128 != 0:
        return wint8_matmul_xla(x2d, wq, scale).reshape(*orig_shape[:-1], n)
    bm = min(block_m, m)
    while m % bm:
        bm //= 2
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    bk = min(block_k, k)
    while k % bk:
        bk //= 2
    out = pl.pallas_call(
        functools.partial(_wint8_kernel, n_k=k // bk),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(x2d.astype(jnp.bfloat16), wq, scale[None, :])
    return out.reshape(*orig_shape[:-1], n)
