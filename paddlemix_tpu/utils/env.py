"""Environment homes and flags.

Analogue of the reference env module (paddlemix/utils/env.py:35-45 PPMIX_HOME) —
but distributed init lives in paddlemix_tpu.parallel.mesh (no process groups on
TPU; a jax Mesh replaces fleet's hybrid topology, reference utils/env.py:106-143).
"""

from __future__ import annotations

import os


def _home() -> str:
    root = os.environ.get("PMIX_TPU_HOME")
    if root is None:
        root = os.path.join(os.path.expanduser("~"), ".paddlemix_tpu")
    os.makedirs(root, exist_ok=True)
    return root


def models_home() -> str:
    p = os.environ.get("PMIX_TPU_MODELS_HOME", os.path.join(_home(), "models"))
    os.makedirs(p, exist_ok=True)
    return p


def datasets_home() -> str:
    p = os.environ.get("PMIX_TPU_DATASETS_HOME", os.path.join(_home(), "datasets"))
    os.makedirs(p, exist_ok=True)
    return p


def cache_home() -> str:
    p = os.environ.get("PMIX_TPU_CACHE_HOME", os.path.join(_home(), "cache"))
    os.makedirs(p, exist_ok=True)
    return p


def bool_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() not in ("0", "false", "no", "off", "")
