"""Activation registry (reference paddlemix/activations.py:174 ACT2FN)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


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
