"""Model base: flax module + params pytree + config, with safetensors IO.

TPU-native replacement for both model bases in the reference:
 - ``MixPretrainedModel`` (reference paddlemix/models/model_utils.py:30-513:
   pretrained load/save, dtype/shape coercion, torch ckpt conversion)
 - ``ModelMixin`` (reference ppdiffusers/ppdiffusers/models/modeling_utils.py:217:
   from_pretrained :661, load_state_dict :150, gradient checkpointing :264)

Design: a model is (flax.linen module, params pytree, config dataclass). All
compute is functional — ``model(...)`` is ``module.apply`` and can be jitted /
pjitted by callers; the wrapper owns only IO and convenience.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from flax.core import freeze, unfreeze

from ..utils.hub import resolve_file
from ..utils.log import logger
from .config import BaseConfig

SAFETENSORS_NAME = "model.safetensors"
SAFETENSORS_INDEX_NAME = "model.safetensors.index.json"
MAX_SHARD_BYTES = 5 * 1024**3

_FLOATS = (jnp.float32, jnp.float16, jnp.bfloat16, jnp.float64)


def flatten_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {".".join(k): v for k, v in traverse_util.flatten_dict(unfreeze(params)).items()}


def unflatten_params(flat: Dict[str, Any]) -> Dict[str, Any]:
    return traverse_util.unflatten_dict({tuple(k.split(".")): v for k, v in flat.items()})


def cast_floating(params, dtype):
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, params)


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def _load_safetensors_file(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            t = f.get_tensor(k)
            # numpy has no bfloat16: safetensors returns a uint16 view via ml_dtypes
            out[k] = t
    return out


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if v.dtype == torch.bfloat16:
            out[k] = v.float().numpy()
        else:
            out[k] = v.numpy()
    return out


def _dtype_kw(module_class, dtype):
    fields = getattr(module_class, "__dataclass_fields__", {})
    return {"dtype": dtype} if "dtype" in fields else {}


class PretrainedModel:
    """Base wrapper: config + flax module + params."""

    config_class: Type[BaseConfig] = BaseConfig
    module_class: type = None
    weights_name = SAFETENSORS_NAME
    # subclasses may set a map of regex renames applied to foreign checkpoints
    torch_key_map: Tuple[Tuple[str, str], ...] = ()

    def __init__(self, config, module=None, params=None, dtype=jnp.float32):
        self.config = config
        # the module must receive the compute dtype: flax layers compute in
        # THEIR dtype field, so dropping it here silently runs fp32 math
        # (8x slower on the MXU) under bf16 params
        if module is None:
            module = self.module_class(config, **_dtype_kw(self.module_class, dtype))
        self.module = module
        self.params = params
        self.dtype = dtype

    # ------------------------------------------------------------------ compute
    def __call__(self, *args, rngs: Optional[Dict[str, jax.Array]] = None, **kwargs):
        variables = {"params": self.params}
        return self.module.apply(variables, *args, rngs=rngs, **kwargs)

    def apply(self, params, *args, **kwargs):
        return self.module.apply({"params": params}, *args, **kwargs)

    # ------------------------------------------------------------------ init
    @classmethod
    def example_inputs(cls, config) -> Tuple[tuple, dict]:
        """Tiny inputs used for shape init. Subclasses override."""
        raise NotImplementedError

    @classmethod
    def from_config(cls, config, seed: int = 0, dtype=jnp.float32):
        module = cls.module_class(config, **_dtype_kw(cls.module_class, dtype))
        args, kwargs = cls.example_inputs(config)
        params = module.init(jax.random.PRNGKey(seed), *args, **kwargs)["params"]
        params = cast_floating(unfreeze(params), dtype)
        return cls(config, module, params, dtype=dtype)

    def params_shape(self):
        args, kwargs = type(self).example_inputs(self.config)
        shapes = jax.eval_shape(lambda: self.module.init(jax.random.PRNGKey(0), *args, **kwargs))
        return unfreeze(shapes)["params"]

    # ------------------------------------------------------------------ save/load
    def save_pretrained(self, save_directory: str, max_shard_bytes: int = MAX_SHARD_BYTES):
        from safetensors.numpy import save_file

        os.makedirs(save_directory, exist_ok=True)
        self.config.save_pretrained(save_directory)
        # ascontiguousarray: safetensors writes the RAW buffer, so a
        # transposed view (e.g. params assigned straight from a torch-key
        # conversion) would silently save the untransposed bytes
        flat = {k: np.ascontiguousarray(np.asarray(v))
                for k, v in flatten_params(self.params).items()}
        total = sum(v.nbytes for v in flat.values())
        if total <= max_shard_bytes:
            save_file(flat, os.path.join(save_directory, self.weights_name))
            return
        # shard
        shards, cur, cur_bytes = [], {}, 0
        for k, v in flat.items():
            if cur and cur_bytes + v.nbytes > max_shard_bytes:
                shards.append(cur)
                cur, cur_bytes = {}, 0
            cur[k] = v
            cur_bytes += v.nbytes
        if cur:
            shards.append(cur)
        index = {"metadata": {"total_size": total}, "weight_map": {}}
        n = len(shards)
        for i, shard in enumerate(shards):
            name = self.weights_name.replace(".safetensors", f"-{i+1:05d}-of-{n:05d}.safetensors")
            save_file(shard, os.path.join(save_directory, name))
            for k in shard:
                index["weight_map"][k] = name
        with open(os.path.join(save_directory, SAFETENSORS_INDEX_NAME), "w") as f:
            json.dump(index, f, indent=2)

    @classmethod
    def _load_flat_state(cls, path_or_repo: str, subfolder: Optional[str]) -> Dict[str, np.ndarray]:
        # sharded index?
        idx = resolve_file(path_or_repo, SAFETENSORS_INDEX_NAME, subfolder=subfolder, required=False)
        if idx is not None:
            with open(idx) as f:
                index = json.load(f)
            base = os.path.dirname(idx)
            flat = {}
            for fname in sorted(set(index["weight_map"].values())):
                flat.update(_load_safetensors_file(os.path.join(base, fname)))
            return flat
        st = resolve_file(path_or_repo, cls.weights_name, subfolder=subfolder, required=False)
        if st is not None:
            return _load_safetensors_file(st)
        # torch fallbacks (diffusers + transformers layouts)
        for name in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
            p = resolve_file(path_or_repo, name, subfolder=subfolder, required=False)
            if p is not None:
                return _load_safetensors_file(p)
        for name in ("pytorch_model.bin", "diffusion_pytorch_model.bin"):
            p = resolve_file(path_or_repo, name, subfolder=subfolder, required=False)
            if p is not None:
                return load_torch_bin(p)
        raise FileNotFoundError(f"no weights found at {path_or_repo!r} (subfolder={subfolder!r})")

    @classmethod
    def convert_foreign_state_dict(cls, flat: Dict[str, np.ndarray], config) -> Dict[str, np.ndarray]:
        """Rename + re-lay-out keys from torch/paddle checkpoints.

        torch Linear stores (out, in); flax Dense kernels are (in, out) — the
        transpose must be semantic (shape comparison misses square matrices).
        Conv OIHW -> HWIO. Only keys ending in ``.weight`` are touched, so our
        own (``.kernel``-named) checkpoints pass through untouched."""
        return convert_torch_state_dict(flat, cls.torch_key_map)

    @classmethod
    def from_pretrained(
        cls,
        path_or_repo: str,
        subfolder: Optional[str] = None,
        dtype=jnp.float32,
        seed: int = 0,
        ignore_mismatched_sizes: bool = False,
        strict: bool = False,
        **config_overrides,
    ):
        config = cls.config_class.from_pretrained(path_or_repo, subfolder=subfolder, **config_overrides)
        flat = cls._load_flat_state(path_or_repo, subfolder)
        return cls.from_state_dict(config, flat, dtype=dtype, seed=seed,
                                   ignore_mismatched_sizes=ignore_mismatched_sizes,
                                   strict=strict)

    @classmethod
    def from_state_dict(cls, config, flat, dtype=jnp.float32, seed: int = 0,
                        ignore_mismatched_sizes: bool = False, strict: bool = False):
        """Build a model from an in-memory foreign state dict (torch-style
        names; used by from_pretrained and the single-file loader).

        strict=True raises when any expected key is missing or un-coercibly
        mismatched instead of silently keeping random init (mirrors the
        reference's load_state_dict error behavior)."""
        flat = cls.convert_foreign_state_dict(flat, config)
        model = cls.from_config(config, seed=seed, dtype=dtype)
        expected = flatten_params(model.params)
        loaded, missing, unexpected, mismatched = {}, [], [], []
        for k, ref in expected.items():
            if k not in flat:
                missing.append(k)
                loaded[k] = ref
                continue
            v = np.asarray(flat[k])
            if tuple(v.shape) != tuple(ref.shape):
                if not ignore_mismatched_sizes:
                    v = _coerce_shape(k, v, tuple(ref.shape))
                    if v is None:
                        mismatched.append((k, np.asarray(flat[k]).shape, tuple(ref.shape)))
                        loaded[k] = ref
                        continue
                else:
                    mismatched.append((k, v.shape, tuple(ref.shape)))
                    loaded[k] = ref
                    continue
            loaded[k] = jnp.asarray(v, dtype=ref.dtype if not jnp.issubdtype(jnp.asarray(ref).dtype, jnp.floating) else dtype)
        for k in flat:
            if k not in expected:
                unexpected.append(k)
        if missing:
            logger.warning("missing keys (%d), e.g. %s", len(missing), missing[:5])
        if unexpected:
            logger.warning("unexpected keys (%d), e.g. %s", len(unexpected), unexpected[:5])
        if mismatched:
            logger.warning("shape-mismatched keys (%d), e.g. %s", len(mismatched), mismatched[:3])
        if strict and (missing or mismatched):
            raise ValueError(
                f"strict load failed: {len(missing)} missing keys (e.g. {missing[:5]}), "
                f"{len(mismatched)} shape-mismatched keys (e.g. {mismatched[:3]})")
        model.params = cast_floating(unflatten_params(loaded), dtype)
        model.dtype = dtype
        return model


_EMBEDDING_MARKERS = ("embedding", "embed_tokens", ".wte.", ".wpe.", ".shared.")


def _is_embedding_key(key: str) -> bool:
    return any(m in key for m in _EMBEDDING_MARKERS)


def convert_torch_state_dict(flat: Dict[str, np.ndarray], key_map=()) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in flat.items():
        nv = v
        if k.endswith(".weight") and getattr(v, "ndim", 0) == 2 and not _is_embedding_key(k):
            nv = np.asarray(v).T
        elif k.endswith(".weight") and getattr(v, "ndim", 0) == 3:
            nv = np.transpose(np.asarray(v), (2, 1, 0))  # Conv1d OIW -> WIO
        elif k.endswith(".weight") and getattr(v, "ndim", 0) == 4:
            nv = np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW -> HWIO
        elif k.endswith(".weight") and getattr(v, "ndim", 0) == 5:
            nv = np.transpose(np.asarray(v), (2, 3, 4, 1, 0))  # Conv3d OIDHW -> DHWIO
        nk = k
        for pat, rep in key_map:
            nk = re.sub(pat, rep, nk)
        out[nk] = nv
    return out


def _coerce_shape(key: str, v: np.ndarray, target: tuple):
    """Try transposes that map torch linear layouts onto flax kernels, plus
    position-embedding interpolation for resolution changes (reference
    paddlemix/checkpoint.py:182-205 bicubic pos-embed interpolation)."""
    if v.ndim == 2 and v.T.shape == target:
        return v.T
    if v.ndim == 3:
        # torch Conv1d OIW -> flax WIO, then ConvTranspose1d IOW -> WIO
        for perm in ((2, 1, 0), (2, 0, 1)):
            if tuple(np.transpose(v, perm).shape) == target:
                return np.transpose(v, perm)
    if v.ndim == 4 and tuple(np.transpose(v, (2, 3, 1, 0)).shape) == target:
        # torch conv OIHW -> flax HWIO
        return np.transpose(v, (2, 3, 1, 0))
    if v.squeeze().shape == target:
        return v.squeeze()
    if ("position_embedding" in key or "pos_embed" in key) and v.ndim == len(target):
        return interpolate_pos_embed(v, target)
    return None


def interpolate_pos_embed(v: np.ndarray, target: tuple):
    """Resize a (S, D) or (1, S, D) position table to a new grid size,
    bicubic over the 2D patch grid, CLS row (if any) kept as-is."""
    import jax
    import jax.numpy as jnp

    squeeze = False
    if v.ndim == 3 and v.shape[0] == 1:
        v = v[0]
        squeeze = True
        target = target[1:]
    if v.ndim != 2 or len(target) != 2 or v.shape[1] != target[1]:
        return None
    s_old, d = v.shape
    s_new = target[0]
    # detect CLS token: grids are perfect squares
    def grid(n):
        r = int(round(n ** 0.5))
        return r if r * r == n else None

    for has_cls in (False, True):
        go = grid(s_old - (1 if has_cls else 0))
        gn = grid(s_new - (1 if has_cls else 0))
        if go and gn:
            cls_rows = v[:1] if has_cls else np.zeros((0, d), v.dtype)
            body = v[1:] if has_cls else v
            body = np.asarray(jax.image.resize(
                jnp.asarray(body, jnp.float32).reshape(go, go, d),
                (gn, gn, d), method="bicubic")).reshape(gn * gn, d)
            out = np.concatenate([cls_rows.astype(np.float32), body], axis=0)
            logger.info("interpolated %s: %d -> %d positions", key_str(v, s_old, s_new), s_old, s_new)
            return out[None] if squeeze else out
    return None


def key_str(v, a, b):
    return f"pos-embed ({a}->{b})"


def enable_recompute(model):
    """Flip gradient checkpointing ON for a loaded model (reference
    `recompute` config flag / torch enable_gradient_checkpointing): sets the
    flag on the model's own config or, for VLM composites, on the nested
    text_config, and rebuilds the module so setup() sees it."""
    import dataclasses as _dc

    c = model.config
    if hasattr(c, "gradient_checkpointing"):
        model.config = _dc.replace(c, gradient_checkpointing=True)
    elif isinstance(getattr(c, "text_config", None), dict):
        model.config = _dc.replace(
            c, text_config=dict(c.text_config, gradient_checkpointing=True))
    else:
        logger.warning("%s has no gradient_checkpointing hook; recompute "
                       "ignored", type(model).__name__)
        return model
    model.module = model.module_class(
        model.config, **_dtype_kw(model.module_class, model.dtype))
    return model
