"""Param sharding rules: regex path -> PartitionSpec.

TPU-native replacement for fleet's Column/RowParallelLinear +
group_sharded_parallel (reference blip2/eva_vit.py:80,140,
blip2_trainer.py:364-409, DiT/diffusion/dit.py:105-173): instead of special
layer classes, plain flax modules get sharded by annotating their param paths
with PartitionSpecs and letting GSPMD insert the collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.log import logger

# A rule: (path_regex, PartitionSpec). First match wins.
Rules = Sequence[Tuple[str, P]]

# Generic transformer TP+FSDP rules. Conventions (flax):
#  - attention qkv / mlp up kernels: (in, out) -> shard out over "tensor"
#  - attention out / mlp down kernels: (in, out) -> shard in over "tensor"
#  - embeddings: (vocab, dim) -> shard vocab over "tensor"
#  - everything else: fsdp-shard the largest dim
TRANSFORMER_RULES: Rules = (
    (r".*(q_proj|k_proj|v_proj|qkv|query|key|value|gate_proj|up_proj|fc1|wi|to_q|to_k|to_v)\.kernel$", P("fsdp", "tensor")),
    (r".*(o_proj|out_proj|dense|down_proj|fc2|wo|to_out.*|proj_out)\.kernel$", P("tensor", "fsdp")),
    # embeddings: gather over a tensor-sharded vocab forces GSPMD full
    # rematerialization; shard vocab over fsdp only (ZeRO-style all-gather)
    (r".*(embed_tokens|wte|token_embedding|shared)\.embedding$", P("fsdp", None)),
    (r".*(lm_head|head|output_projection)\.kernel$", P("fsdp", "tensor")),
    (r".*\.kernel$", P(None, "fsdp")),
    (r".*", P()),
)

# Diffusion (UNet/DiT) rules: attention + GEGLU projections tensor-parallel,
# conv kernels ZeRO-sharded on the output-channel dim (the reference shards
# the UNet only via group_sharded ZeRO; TP on the transformer blocks is the
# TPU-native extra). Conv kernels are flax (kh, kw, in, out).
UNET_RULES: Rules = (
    (r".*(to_q|to_k|to_v)\.kernel$", P("fsdp", "tensor")),
    (r".*(to_out.*|proj_attn|proj_out)\.kernel$", P("tensor", "fsdp")),
    (r".*net_0.*proj\.kernel$", P("fsdp", "tensor")),
    (r".*net_2\.kernel$", P("tensor", "fsdp")),
    (r".*\.kernel$", P(None, None, None, "fsdp")),  # convs; _fit_spec trims 2-D
    (r".*", P()),
)


def spec_for_path(path: str, rules: Rules) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return P()


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop or blank axes that don't divide the corresponding dim."""
    out = []
    for i, dim in enumerate(shape):
        ax = spec[i] if i < len(spec) else None
        if ax is None:
            out.append(None)
            continue
        axes = ax if isinstance(ax, tuple) else (ax,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        out.append(ax if dim % size == 0 else None)
    # conv kernels etc. with fewer dims than spec: truncate
    out = out[: len(shape)]
    if all(a is None for a in out):
        return P()
    return P(*out)


def current_mesh() -> Optional[Mesh]:
    """The mesh from an enclosing ``with mesh:`` block, or None."""
    from jax._src import mesh as mesh_lib

    env = mesh_lib.thread_resources.env
    m = env.physical_mesh
    return None if m.empty else m


def shard_activations(x, batch_axes: Tuple[str, ...] = ("data", "fsdp"),
                      mesh: Optional[Mesh] = None):
    """Constrain an activation's batch dim to the data axes of the active mesh.

    Placed at layer boundaries this pins the forward AND backward activation
    layouts so GSPMD never invents a batch->tensor resharding (the source of
    "[SPMD] Involuntary full rematerialization" warnings). No-op outside a
    mesh context or when the batch doesn't divide.
    """
    mesh = mesh if mesh is not None else current_mesh()
    if mesh is None or x.ndim == 0:
        return x
    names = tuple(a for a in batch_axes if a in mesh.shape and mesh.shape[a] > 1)
    seq_n = int(mesh.shape.get("sequence", 1))
    seq_ax = ("sequence" if seq_n > 1 and x.ndim >= 3 and x.shape[1] % seq_n == 0
              else None)
    if not names and seq_ax is None:
        return x
    if names:
        size = int(np.prod([mesh.shape[a] for a in names]))
        if x.shape[0] % size != 0:
            names = ()
    if not names and seq_ax is None:
        return x
    if x.ndim == 1:
        spec = P(names if names else None)
    else:
        spec = P(names if names else None, seq_ax, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def make_shardings(params: Any, mesh: Mesh, rules: Rules = TRANSFORMER_RULES) -> Any:
    """Pytree of NamedShardings matching ``params`` (works on shapes too)."""
    from flax import traverse_util
    from flax.core import unfreeze

    flat = traverse_util.flatten_dict(unfreeze(params))
    out = {}
    for kpath, leaf in flat.items():
        path = ".".join(
            ".".join(p) if isinstance(p, tuple) else str(p) for p in kpath)
        spec = _fit_spec(spec_for_path(path, rules), tuple(leaf.shape), mesh)
        out[kpath] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out)


def shard_params(params: Any, mesh: Mesh, rules: Rules = TRANSFORMER_RULES) -> Any:
    shardings = make_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
