"""Pipeline parallelism, TPU-native (replaces the reference's fleet
pp_degree / PipelineLayer stack, trainer/blip2_trainer.py:275-421).

GPipe schedule written as pure JAX inside shard_map: every device holds one
*stage* (a slice of the layer stack, params sharded on their leading axis
over the "stage" mesh axis) and activations rotate stage->stage+1 with
lax.ppermute each tick. The whole schedule is one lax.scan, so jax.grad
differentiates straight through the collective — backward pipelining comes
for free, no hand-written 1F1B state machine.

Bubble fraction is (S-1)/(M+S-1) for S stages and M microbatches, exactly as
in the classic GPipe analysis; pick num_microbatches >= 4*stages to amortize.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpipe_spmd(stage_fn: Callable, stage_params, microbatches, *,
               axis_name: str = "stage"):
    """Run inside shard_map: stage_params is THIS stage's params, microbatches
    is (M, ...) (replicated). Returns (M, ...) outputs valid on the last stage
    (psum-broadcast so every stage returns the same value)."""
    n_stages = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    m = microbatches.shape[0]
    total = m + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        buf = carry  # activation arriving from the previous stage
        inject = microbatches[jnp.clip(t, 0, m - 1)]
        x = jnp.where(stage == 0, inject, buf)
        y = stage_fn(stage_params, x)
        out = jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y))
        buf = jax.lax.ppermute(y, axis_name, perm)
        return buf, out

    _, outs = jax.lax.scan(tick, jnp.zeros_like(microbatches[0]), jnp.arange(total))
    # microbatch i leaves the last stage at tick i + n_stages - 1
    outs = outs[n_stages - 1:]
    # broadcast the last stage's result to all stages (sum of one-hot zeros)
    return jax.lax.psum(outs, axis_name) if n_stages > 1 else outs


def make_pipeline_forward(mesh: Mesh, stage_fn: Callable, *,
                          num_microbatches: int, axis_name: str = "stage"):
    """Build fn(stacked_params, batch) -> out.

    stacked_params: every leaf has leading dim n_stages, sharded over
    `axis_name` (one stage's slice per device group). batch: (B, ...) with
    B % num_microbatches == 0. stage_fn(params_slice, x) -> y with
    y.shape == x.shape (uniform stages, e.g. equal transformer slices)."""

    param_spec = P(axis_name)
    data_spec = P()

    def spmd(stacked_params, microbatches):
        local = jax.tree.map(lambda p: p[0], stacked_params)  # this stage's slice
        return gpipe_spmd(stage_fn, local, microbatches, axis_name=axis_name)

    def forward(stacked_params, batch):
        b = batch.shape[0]
        mb = batch.reshape(num_microbatches, b // num_microbatches, *batch.shape[1:])
        in_specs = (jax.tree.map(lambda _: param_spec, stacked_params), data_spec)
        fn = shard_map(spmd, mesh=mesh, in_specs=in_specs, out_specs=data_spec,
                       check_vma=False)
        out = fn(stacked_params, mb)
        return out.reshape(b, *out.shape[2:])

    return forward


def stack_stage_params(per_layer_params, n_stages: int):
    """Group a list of per-layer param pytrees into n_stages stacked slices:
    returns a pytree whose leaves are (n_stages, layers_per_stage, ...)."""
    n_layers = len(per_layer_params)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per_stage = n_layers // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer_params)
    return jax.tree.map(
        lambda x: x.reshape(n_stages, per_stage, *x.shape[1:]), stacked)
