"""Profiling/tracing hooks — new functionality vs the reference, which has
none (SURVEY.md §5.1): jax.profiler trace capture + a per-step wall-clock
timer with percentile summaries.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with percentile summaries.

    Note: in async-dispatch runtimes, wrap the timed region so it includes a
    device sync (e.g. fetching a metric scalar), else you time enqueue only.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def device_op_table(trace_dir: str, runs: int = 1,
                    device_substr: str = "TPU") -> List[Dict]:
    """Aggregate per-op device time from a jax.profiler trace directory.

    Parses the trace.json.gz the profiler writes (works through the remote
    TPU relay, where xprof's UI is unavailable) and returns rows
    [{"op", "us_per_run", "share"}] sorted by time, skipping the jit_*
    umbrella events that double-count their children.

    Usage:
        with trace("/tmp/tr"):
            for _ in range(runs): float(jnp.sum(step(...)))
        for row in device_op_table("/tmp/tr", runs=runs)[:15]:
            print(row)
    """
    import glob
    import gzip
    import json
    from collections import Counter

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(paths[-1]))
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = str(e["args"].get("name"))
    agg: Counter = Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and device_substr in pids.get(e.get("pid"),
                                                           ""):
            if e["name"].startswith("jit_"):
                continue
            agg[e["name"]] += e.get("dur", 0)
    total = sum(agg.values()) or 1
    return [{"op": name, "us_per_run": us / runs, "share": us / total}
            for name, us in agg.most_common()]
