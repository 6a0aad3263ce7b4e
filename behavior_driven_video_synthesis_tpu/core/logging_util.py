"""Metric logging: jsonl always, wandb/tensorboard when available.

The reference logs through wandb with tensorboard sync
(experiments/experiment.py:31-37) and ignite Average metrics
(behavior_net.py:744-775).  Here: a dependency-light MetricLogger that
appends one JSON line per log call to ``<log_dir>/metrics.jsonl`` and
forwards to wandb/TB if importable+configured, plus a windowed averager
replacing ignite's ``AverageNIterations``.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np


class RunningAverage:
    """Average of the last N values per key (ignite AverageNIterations)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._buf: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self.window))

    def update(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0:
                self._buf[k].append(float(v))

    def averages(self) -> Dict[str, float]:
        return {k: float(np.mean(b)) for k, b in self._buf.items() if b}


class MetricLogger:
    def __init__(self, log_dir: str, project: Optional[str] = None,
                 use_wandb: bool = False):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self.path = os.path.join(self.log_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project or "bdvs_tpu",
                           dir=self.log_dir, resume="allow")
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, float], step: int,
            prefix: str = ""):
        clean = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim == 0 and np.issubdtype(arr.dtype, np.number):
                clean[(prefix + k) if prefix else k] = float(arr)
        record = {"step": int(step), "time": time.time(), **clean}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(clean, step=int(step))

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
