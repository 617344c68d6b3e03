"""Trainer callbacks: benchmark telemetry, tensorboard, profiler.

Rebuild of the reference telemetry (SURVEY §5: BenchmarkCallback ips/memory
blip2_trainer.py:125-155; --profiler_options TIPC hook run_benchmark.sh:54-57;
tensorboardX in CLIPTrainer trainer.py:101-106). Callbacks receive
(step, metrics) from Trainer.train."""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax

from ..utils.log import logger


class BenchmarkCallback:
    """ips / step-time / device-memory telemetry with warmup skip (the
    reference skips 4 warmup steps, run_benchmark.sh:19-50)."""

    def __init__(self, skip_steps: int = 4, log_every: int = 10):
        self.skip_steps = skip_steps
        self.log_every = log_every
        self.records = []

    def __call__(self, step: int, metrics: Dict):
        if step <= self.skip_steps:
            return
        rec = {"step": step, "ips": float(metrics.get("ips", 0.0)),
               "loss": float(metrics.get("loss", 0.0))}
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            rec["bytes_in_use"] = stats.get("bytes_in_use", 0)
            rec["peak_bytes_in_use"] = stats.get("peak_bytes_in_use", 0)
        except Exception:
            pass
        self.records.append(rec)
        if step % self.log_every == 0 and rec.get("peak_bytes_in_use"):
            logger.train("benchmark step %d ips: %.3f peak_mem: %.2f GB",
                         step, rec["ips"], rec["peak_bytes_in_use"] / 2 ** 30)

    def summary(self) -> Dict:
        if not self.records:
            return {}
        ips = [r["ips"] for r in self.records]
        return {"mean_ips": sum(ips) / len(ips), "max_ips": max(ips),
                "steps": len(self.records)}


class TensorBoardCallback:
    """Scalars to tensorboard (reference visualdl/tensorboardX reporting)."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        self.writer = SummaryWriter(log_dir)

    def __call__(self, step: int, metrics: Dict):
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        self.writer.close()


class ProfilerCallback:
    """jax.profiler trace over a step window (reference --profiler_options
    'batch_range=[10,20]')."""

    def __init__(self, log_dir: str, start_step: int = 10, end_step: int = 20):
        self.log_dir = log_dir
        self.start_step = start_step
        self.end_step = end_step
        self._active = False

    def __call__(self, step: int, metrics: Dict):
        if step == self.start_step and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            try:
                jax.profiler.start_trace(self.log_dir)
                self._active = True
                logger.info("profiler trace started -> %s", self.log_dir)
            except Exception as e:
                logger.warning("profiler unavailable: %s", e)
        elif step >= self.end_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace written to %s", self.log_dir)


def parse_profiler_options(spec: Optional[str]) -> Optional[ProfilerCallback]:
    """Parse the reference's 'batch_range=[10,20];...' flag format."""
    if not spec:
        return None
    opts = dict(kv.split("=", 1) for kv in spec.split(";") if "=" in kv)
    rng = opts.get("batch_range", "[10,20]").strip("[]").split(",")
    return ProfilerCallback(opts.get("profile_path", "profile"),
                            int(rng[0]), int(rng[1]))
