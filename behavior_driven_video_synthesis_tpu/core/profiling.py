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
    """Aggregate per-op device SELF time from a jax.profiler trace directory.

    Parses the trace.json.gz the profiler writes (works through the remote
    TPU relay, where xprof's UI is unavailable) and returns rows
    [{"op", "us_per_run", "share"}] sorted by time.  Events nest (a
    `while` umbrella spans every op of its loop body; `jit_*` spans the
    whole program), so naive duration sums double-count: this computes
    per-event self time with an interval stack per (pid, tid) — each
    event's duration minus its direct children's — which both removes the
    double count and surfaces the ops *inside* while/scan loop bodies.

    Usage:
        with trace("/tmp/tr"):
            for _ in range(runs): float(jnp.sum(step(...)))
        for row in device_op_table("/tmp/tr", runs=runs)[:15]:
            print(row)
    """
    import glob
    import gzip
    import json
    from collections import Counter, defaultdict

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(paths[-1]))
    pids = {}
    tids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = str(e["args"].get("name"))
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = str(e["args"].get("name"))
    by_track = defaultdict(list)
    meta: Dict[str, Dict] = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and device_substr in pids.get(e.get("pid"),
                                                           ""):
            # Module umbrellas live on their own track ("XLA Modules")
            # where no leaf nests under them — self time there would
            # double-count the whole program span.  Names are "jit_<fn>"
            # normally but bare module ids (e.g. "5") for donated/named
            # computations, so filter by the track's thread_name too.
            if e["name"].startswith("jit_"):
                continue
            track = tids.get((e.get("pid"), e.get("tid")), "")
            if "Modules" in track or track == "Steps":
                continue
            by_track[(e.get("pid"), e.get("tid"))].append(
                (float(e.get("ts", 0)), float(e.get("dur", 0)), e["name"]))
            if e["name"] not in meta and isinstance(e.get("args"), dict):
                meta[e["name"]] = {k: v for k, v in e["args"].items()
                                   if isinstance(v, str) and v}
    agg: Counter = Counter()
    for events in by_track.values():
        # parents first at equal start times (longer duration first)
        events.sort(key=lambda t: (t[0], -t[1]))
        stack: List[List] = []  # [ts, end, name, child_dur]
        for ts, dur, name in events:
            while stack and ts >= stack[-1][1] - 1e-9:
                fin = stack.pop()
                agg[fin[2]] += max(0.0, fin[1] - fin[0] - fin[3])
            if stack:
                stack[-1][3] += dur
            stack.append([ts, ts + dur, name, 0.0])
        while stack:
            fin = stack.pop()
            agg[fin[2]] += max(0.0, fin[1] - fin[0] - fin[3])
    total = sum(agg.values()) or 1
    return [{"op": name, "us_per_run": us / runs, "share": us / total,
             "meta": meta.get(name, {})}
            for name, us in agg.most_common() if us > 0]
