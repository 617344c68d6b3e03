"""Deployment: AOT compilation + serialized executables.

TPU-native replacement for the reference's static-graph deployment stack
(deploy/llava/export_model.py + run_static_predict.py via paddle.jit.save and
Paddle Inference create_predictor, ppdiffusers/models/paddleinfer_runtime.py:
47-398 PaddleInferRuntimeModel): on TPU there is no separate engine — a jitted
function IS the static graph. This module adds the two missing conveniences:

  export_fn / load_fn   — serialize a jitted computation (jax.export stablehlo
                          bytes) so serving processes skip tracing
  Predictor             — thin runtime wrapper: load weights + AOT-compile the
                          forward for fixed shapes, with a persistent
                          compilation cache (replaces TRT engine caches)
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .utils.log import logger


def enable_compilation_cache(path: str = ".jax_cache"):
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))


def export_fn(fn: Callable, example_args: Tuple, path: str) -> None:
    """Serialize ``jit(fn)`` for ``example_args`` shapes to ``path``."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    logger.info("exported %s (%d KB)", path, len(data) // 1024)


def load_fn(path: str) -> Callable:
    """Load a serialized computation; returns a callable over device arrays."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return lambda *args: exported.call(*args)


class Predictor:
    """Static-shape serving wrapper (reference PaddleInferRuntimeModel).

    predictor = Predictor(model.module.apply, {"params": model.params})
    predictor.compile(example_inputs...)   # AOT, cached
    out = predictor(inputs...)
    """

    def __init__(self, apply_fn: Callable, variables: Dict[str, Any],
                 donate_inputs: bool = False):
        self.apply_fn = apply_fn
        self.variables = variables
        self._compiled: Dict[Tuple, Any] = {}
        self._jit = jax.jit(lambda v, *a, **k: apply_fn(v, *a, **k))

    @staticmethod
    def _key(args, kwargs):
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        return tuple((tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l))))
                     for l in leaves)

    def compile(self, *args, **kwargs):
        key = self._key(args, kwargs)
        if key not in self._compiled:
            self._compiled[key] = (
                self._jit.lower(self.variables, *args, **kwargs).compile())
        return self._compiled[key]

    def __call__(self, *args, **kwargs):
        return self.compile(*args, **kwargs)(self.variables, *args, **kwargs)

    def cost_analysis(self, *args, **kwargs) -> Dict[str, float]:
        c = self.compile(*args, **kwargs).cost_analysis()
        return c[0] if isinstance(c, (list, tuple)) else (c or {})
