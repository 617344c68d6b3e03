"""Static-scale a8w8 post-training quantization (PTQ).

The reference's production int8 path uses calibrated static activation scales
(paddle PTQ / paddlemix triton weight_only_int8 + Paddle Inference quant
passes); our dynamic a8w8 (ops/quant.py) measures NEGATIVE end-to-end on v5e
because the per-call activation amax reduce + rescale costs more HBM traffic
than the int8 MXU saves. With calibrated scales the quantize becomes one
fused elementwise op (no reduce), which XLA folds into the producer.

TPU-native mechanism: no module rewrites or processor swaps — a flax
`nn.intercept_methods` interceptor replaces every `nn.Dense`/`nn.Conv`
`__call__` with an int8 dot/conv using the module's own params plus a
calibrated per-layer activation scale, keyed by the module path. Calibration
is one eager forward that records activation absmax per layer.

Usage:
    scales = calibrate(model.module, {"params": params}, *example_args)
    with quantized(scales):
        y = jax.jit(fn)(...)   # traces Dense/Conv as a8w8
"""

from __future__ import annotations

import contextlib
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _path_key(module: nn.Module) -> str:
    return "/".join(str(p) for p in module.path)


def _quant_i8(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / scale)),
                    -127, 127).astype(jnp.int8)


# --------------------------------------------------------------- calibration
def calibrate(module: nn.Module, variables, *args,
              batches: Sequence[tuple] = (), **kwargs) -> Dict[str, float]:
    """Run eager forward(s), recording per-layer input absmax for every
    Dense/Conv. Returns {module_path: activation_absmax}. Extra calibration
    batches (tuples of positional args) widen the statistics."""
    stats: Dict[str, float] = {}

    def interceptor(next_fun, f_args, f_kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and isinstance(mod, (nn.Dense, nn.Conv)):
            x = f_args[0]
            amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
            key = _path_key(mod)
            stats[key] = max(stats.get(key, 0.0), amax, 1e-6)
        return next_fun(*f_args, **f_kwargs)

    with nn.intercept_methods(interceptor):
        module.apply(variables, *args, **kwargs)
        for extra in batches:
            module.apply(variables, *extra, **kwargs)
    return stats


def calibrate_jit(module: nn.Module, variables, *args, **kwargs) -> Dict[str, float]:
    """One-shot calibration compiled as a single XLA program (the eager
    variant dispatches each op separately — minutes for an SDXL UNet on a
    relayed chip). Per-layer amax tensors become jit outputs keyed by path."""
    stats = {}

    def interceptor(next_fun, f_args, f_kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and isinstance(mod, (nn.Dense, nn.Conv)):
            stats[_path_key(mod)] = jnp.max(jnp.abs(f_args[0].astype(jnp.float32)))
        return next_fun(*f_args, **f_kwargs)

    keys = []

    def run(variables, *args):
        stats.clear()
        with nn.intercept_methods(interceptor):
            module.apply(variables, *args, **kwargs)
        keys[:] = list(stats)
        # ONE stacked output: hundreds of scalar outputs make XLA's output
        # handling pathological (an SDXL-size calibration failed to compile
        # inside 9 minutes with a dict return; seconds with a vector)
        return jnp.stack([stats[k] for k in keys])

    out = np.asarray(jax.jit(run)(variables, *args))
    return {k: max(float(v), 1e-6) for k, v in zip(keys, out)}


# ---------------------------------------------------------------- inference
def _dense_a8w8(mod: nn.Dense, x, act_scale: float):
    kernel = mod.variables["params"]["kernel"]
    wmax = jnp.maximum(jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=0,
                               keepdims=True), 1e-8)
    wq = _quant_i8(kernel, wmax)          # loop-invariant: XLA hoists
    xq = _quant_i8(x, act_scale)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (act_scale / 127.0) * (wmax / 127.0)
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


def _conv_a8w8(mod: nn.Conv, x, act_scale: float):
    kernel = mod.variables["params"]["kernel"]  # (kh, kw, in, out) HWIO
    rank = kernel.ndim - 2
    red = tuple(range(kernel.ndim - 1))
    wmax = jnp.maximum(jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=red,
                               keepdims=True), 1e-8)
    wq = _quant_i8(kernel, wmax)
    xq = _quant_i8(x, act_scale)
    strides = mod.strides or (1,) * rank
    if isinstance(strides, int):
        strides = (strides,) * rank
    padding = mod.padding
    if isinstance(padding, int):
        padding = ((padding, padding),) * rank
    spec = "NHWC" if rank == 2 else ("NWC" if rank == 1 else "NDHWC")
    kspec = "HWIO" if rank == 2 else ("WIO" if rank == 1 else "DHWIO")
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        (spec, kspec, spec))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    sw = wmax.reshape((1,) * (acc.ndim - 1) + (acc.shape[-1],))
    y = acc.astype(jnp.float32) * (act_scale / 127.0) * (sw / 127.0)
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


def _supported_conv(mod: nn.Conv) -> bool:
    return (mod.feature_group_count == 1
            and (mod.kernel_dilation in (None, 1) or
                 tuple(np.atleast_1d(mod.kernel_dilation)) ==
                 (1,) * len(np.atleast_1d(mod.kernel_dilation)))
            and (mod.input_dilation in (None, 1) or
                 tuple(np.atleast_1d(mod.input_dilation)) ==
                 (1,) * len(np.atleast_1d(mod.input_dilation)))
            and (not isinstance(mod.padding, str)
                 or mod.padding in ("SAME", "VALID")))


@contextlib.contextmanager
def quantized(scales: Dict[str, float], min_features: int = 64):
    """Context manager: while active (including during jit tracing), every
    calibrated Dense/Conv call runs as static-scale a8w8. Layers absent from
    ``scales`` or with < min_features input features stay in fp."""

    def interceptor(next_fun, f_args, f_kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*f_args, **f_kwargs)
        key = _path_key(mod) if isinstance(mod, (nn.Dense, nn.Conv)) else None
        if key is None or key not in scales:
            return next_fun(*f_args, **f_kwargs)
        x = f_args[0]
        if x.shape[-1] < min_features:
            return next_fun(*f_args, **f_kwargs)
        if isinstance(mod, nn.Dense):
            return _dense_a8w8(mod, x, float(scales[key]))
        if isinstance(mod, nn.Conv) and _supported_conv(mod) and x.ndim in (3, 4, 5):
            return _conv_a8w8(mod, x, float(scales[key]))
        return next_fun(*f_args, **f_kwargs)

    with nn.intercept_methods(interceptor):
        yield
