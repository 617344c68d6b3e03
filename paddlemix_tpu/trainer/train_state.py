"""Sharded train state: params + optimizer state laid out over the mesh.

TPU-native replacement for the reference's hybrid-parallel model wrap
(BLIP2Trainer._wrap_model blip2_trainer.py:275-421: DataParallel /
group_sharded ZeRO / TensorParallel / pipeline). Here the same outcome —
params, grads and optimizer state sharded across devices — comes from
PartitionSpec rules + jit shardings; XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.sharding import Rules, TRANSFORMER_RULES, make_shardings


class TrainState(NamedTuple):
    """Arrays only — optimizer/apply functions stay in closures."""

    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def _dict_key_path(path) -> tuple:
    return tuple(k.key for k in path if isinstance(k, jax.tree_util.DictKey))


def state_shardings(state: TrainState, mesh: Mesh, rules: Rules = TRANSFORMER_RULES) -> TrainState:
    """NamedShardings for the whole state. Optimizer moments mirror the param
    layout (that IS ZeRO/"sharding" from the reference: optimizer state never
    materializes replicated).

    Moments are matched to params by tree path (optax moment trees embed the
    param dict verbatim), NOT by shape: two params can share a shape but have
    different PartitionSpecs, and a moment laid out differently from its param
    forces GSPMD resharding inside the update."""
    param_sh = make_shardings(state.params, mesh, rules)
    by_path = {}
    for path, sh in jax.tree_util.tree_flatten_with_path(param_sh)[0]:
        by_path[_dict_key_path(path)] = sh
    shape_by_path = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        shape_by_path[_dict_key_path(path)] = tuple(leaf.shape)

    def leaf_sharding(path, leaf):
        key = _dict_key_path(path)
        s = by_path.get(key)
        if s is not None and tuple(getattr(leaf, "shape", ())) == shape_by_path.get(key):
            return s
        return NamedSharding(mesh, P())

    opt_sh = jax.tree_util.tree_map_with_path(leaf_sharding, state.opt_state)
    return TrainState(step=NamedSharding(mesh, P()), params=param_sh, opt_state=opt_sh)


def shard_train_state(state: TrainState, mesh: Mesh,
                      rules: Rules = TRANSFORMER_RULES) -> TrainState:
    sh = state_shardings(state, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, rules: Rules = TRANSFORMER_RULES,
                    example_state: Optional[TrainState] = None, donate: bool = False):
    # donate=False by default: the initial state often aliases model.params;
    # enable donation only once the caller owns a private (device_put) copy.
    """Build a jitted (state, batch, rng) -> (state, metrics) step.

    loss_fn(params, batch, rng) -> loss or (loss, aux dict). With a mesh, the
    batch enters sharded over (data, fsdp) and the state keeps its rule-derived
    layout; XLA turns the layouts into DP psums / TP reductions / FSDP
    all-gathers — the whole fleet wrap collapses into sharding annotations."""

    def step_fn(state: TrainState, batch, rng):
        def wrapped(params):
            out = loss_fn(params, batch, rng)
            return out if isinstance(out, tuple) else (out, {})

        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return TrainState(state.step + 1, new_params, new_opt), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    assert example_state is not None, "mesh mode needs example_state for shardings"
    state_sh = state_shardings(example_state, mesh, rules)

    return jax.jit(
        step_fn,
        in_shardings=(state_sh, None, NamedSharding(mesh, P())),
        out_shardings=(state_sh, None),
        donate_argnums=(0,) if donate else (),
    )


def shard_batch(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp")))), batch)
