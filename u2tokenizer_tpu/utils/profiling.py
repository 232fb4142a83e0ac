"""Profiling / tracing utilities (aux subsystem).

The reference has no tracing at all (SURVEY.md §5: DeepSpeed
wall_clock_breakdown off; GREEN prints seconds/example). Here: a jax.profiler
trace context for TensorBoard-viewable device traces, a step timer with
percentile summaries, and device-memory introspection.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/u2_trace"):
    """Capture a jax.profiler device trace (open with TensorBoard)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with p50/p90/p99 summaries; write to jsonl."""

    def __init__(self, name: str = "step", warmup: int = 1):
        self.name = name
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            f"{self.name}_mean_s": float(arr.mean()),
            f"{self.name}_p50_s": float(np.percentile(arr, 50)),
            f"{self.name}_p90_s": float(np.percentile(arr, 90)),
            f"{self.name}_p99_s": float(np.percentile(arr, 99)),
            f"{self.name}_count": float(len(arr)),
        }

    def dump(self, path: str):
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {k: int(v) for k, v in stats.items()
                           if isinstance(v, (int, np.integer))}
    return out


def param_count_report(params) -> Dict[str, int]:
    """Parameter counts by top-level module (observability helper)."""
    import jax

    p = params.get("params", params)
    report = {}
    for key, sub in p.items():
        report[key] = sum(int(x.size) for x in jax.tree_util.tree_leaves(sub))
    report["total"] = sum(report.values())
    return report
