"""Kernel backend dispatch.

TPU-native analogue of the reference's SDPA backend dispatch
(ppdiffusers/patches/paddle_patch.py:414-530 — math / memory-efficient /
flash backends selected by dtype+env). Here the choice is pallas-vs-XLA,
selected by platform with env overrides:

  PMIX_KERNEL_BACKEND=pallas|xla   force a backend globally
  PMIX_PALLAS_INTERPRET=1          run pallas kernels in interpreter mode
"""

from __future__ import annotations

import functools
import os

import jax


@functools.lru_cache(None)
def _platform() -> str:
    return jax.default_backend()


def interpret_mode() -> bool:
    return os.environ.get("PMIX_PALLAS_INTERPRET", "") == "1"


def use_pallas() -> bool:
    forced = os.environ.get("PMIX_KERNEL_BACKEND")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    return _platform() == "tpu" or interpret_mode()
