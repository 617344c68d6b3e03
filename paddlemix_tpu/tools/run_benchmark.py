"""TIPC-style training benchmark runner.

Rebuild of the reference benchmark CI harness (tests/test_tipc/.../
run_benchmark.sh:19-50: run a training config, skip warmup steps, parse the
'ips:' lines, report mean). Usage:

  python -m paddlemix_tpu.tools.run_benchmark config.json \
      [--max_steps N] [--skip_steps 4] [--output result.json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def parse_ips_lines(log_text: str, skip_steps: int = 4):
    """Extract ips values from 'ips: <v> samples/sec' log lines."""
    vals = [float(m.group(1)) for m in
            re.finditer(r"ips:\s*([0-9.]+)\s*samples/sec", log_text)]
    return vals[skip_steps:] if len(vals) > skip_steps else vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--max_steps", type=int, default=20)
    ap.add_argument("--skip_steps", type=int, default=4)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import io
    import logging

    from ..utils.log import logger
    from .supervised_finetune import main as sft_main

    buf = io.StringIO()
    handler = logging.StreamHandler(buf)
    handler.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(handler)
    try:
        sft_main(args.config, overrides={"max_steps": args.max_steps,
                                         "logging_steps": 1, "save_steps": 0})
    finally:
        logger.removeHandler(handler)

    ips = parse_ips_lines(buf.getvalue(), args.skip_steps)
    result = {
        "ips_mean": sum(ips) / len(ips) if ips else 0.0,
        "ips_max": max(ips) if ips else 0.0,
        "steps_measured": len(ips),
        "skip_steps": args.skip_steps,
        "speed_unit": "sample/sec",
    }
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
