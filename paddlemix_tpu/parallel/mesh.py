"""Device-mesh bootstrap: the TPU-native ``setdistenv``.

The reference configures fleet hybrid parallel from four degree flags
(dp/sharding/tp/pp) plus sep (reference paddlemix/utils/env.py:106-143,
trainer/blip2_trainer.py:275-421). On TPU all of that collapses to one
``jax.sharding.Mesh`` with named axes; collectives are inserted by XLA over
ICI/DCN. Axis names used across the framework:

  stage     — pipeline parallel (reference fleet pp; GPipe over ppermute,
              see parallel/pipeline.py) — outermost so stages ride the
              slowest links (DCN between slices)
  data      — data parallel (plain DP, gradient psum)
  fsdp      — ZeRO-3 style parameter/optimizer sharding (reference "sharding")
  tensor    — tensor (megatron) parallel (reference fleet mp)
  sequence  — sequence/context parallel (reference "sep")
  expert    — expert parallel for MoE layers (parallel/moe.py); XLA inserts
              the all-to-alls from sharding constraints
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("stage", "data", "fsdp", "tensor", "sequence", "expert")


@dataclasses.dataclass
class MeshConfig:
    data_parallel_degree: int = -1  # -1: infer from device count
    fsdp_parallel_degree: int = 1   # reference: sharding_parallel_degree
    tensor_parallel_degree: int = 1
    sequence_parallel_degree: int = 1  # reference: sep_parallel_degree
    pipeline_parallel_degree: int = 1  # reference: pp_degree
    expert_parallel_degree: int = 1    # reference: moe expert parallel

    def degrees(self, n_devices: int) -> tuple:
        d = [self.pipeline_parallel_degree, self.data_parallel_degree,
             self.fsdp_parallel_degree, self.tensor_parallel_degree,
             self.sequence_parallel_degree, self.expert_parallel_degree]
        fixed = int(np.prod([x for x in d if x != -1]))
        n_infer = sum(1 for x in d if x == -1)
        if n_infer > 1:
            raise ValueError("at most one mesh axis may be -1 (inferred)")
        if n_infer == 1:
            if n_devices % fixed != 0:
                raise ValueError(f"{n_devices} devices not divisible by fixed degrees {fixed}")
            d = [n_devices // fixed if x == -1 else x for x in d]
        if int(np.prod(d)) != n_devices:
            raise ValueError(f"mesh degrees {d} do not multiply to device count {n_devices}")
        return tuple(d)


def create_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    **kwargs,
) -> Mesh:
    if config is None:
        config = MeshConfig(**kwargs)
    elif kwargs:
        config = dataclasses.replace(config, **kwargs)
    devices = list(devices if devices is not None else jax.devices())
    degrees = config.degrees(len(devices))
    dev_array = np.asarray(devices).reshape(degrees)
    return Mesh(dev_array, AXES)


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.asarray([device]).reshape((1,) * len(AXES)), AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dims shard over (data, fsdp); everything else replicated."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def axis_rank(axis: str) -> jax.Array:
    """Inside pjit/shard_map: this device's index along ``axis``."""
    return jax.lax.axis_index(axis)


def fold_in_mesh_rng(key: jax.Array, axes: Sequence[str] = ("data", "fsdp", "sequence")) -> jax.Array:
    """Per-rank RNG (reference hybrid RNG tracker, utils/env.py:90-103):
    distinct dropout keys per data/sequence rank, identical across tensor."""
    for i, ax in enumerate(axes):
        key = jax.random.fold_in(key, jax.lax.axis_index(ax) * 7919 + i)
    return key
