"""Experiment base: directories, device mesh, checkpointing, logging.

Replaces reference experiments/experiment.py: the torch device/DataParallel
handling becomes mesh construction (SPMD data parallel over all local
devices); `_load_ckpt`'s latest-by-filename parsing becomes orbax
latest-by-step restore.
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.logging_util import MetricLogger, RunningAverage
from ..parallel import make_mesh, replicate, shard_batch


class Experiment:
    def __init__(self, config, dirs: Dict[str, str]):
        self.config = config
        self.dirs = dirs
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)

        n_dev = len(jax.devices())
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        self.logger = MetricLogger(
            dirs.get("log", "./log"),
            project=config.general.get("project_name"),
            use_wandb=bool(config.get("logging", {}).get("use_wandb",
                                                         False)),
        )
        self.avg = RunningAverage(window=100)
        self.debug = bool(config.general.get("debug", False))
        # metric-fetch cadence: pulling metrics to host EVERY step costs a
        # blocking device round trip per step (through this environment's
        # relay that can be 0.3-10 s!), serializing training.  Sample
        # metrics every N steps instead; async dispatch then overlaps the
        # steps in between.
        self.metrics_every = int(config.get("logging", {}).get(
            "metrics_every", 10))
        self._metric_tick = 0

    def collect(self, metrics) -> None:
        """Sampled metric collection (host fetch every metrics_every
        steps)."""
        self._metric_tick += 1
        if self._metric_tick % self.metrics_every == 0:
            self.avg.update(jax.device_get(metrics))

    def ckpt_manager(self, role: str, max_to_keep: int = 3
                     ) -> CheckpointManager:
        # logging.async_ckpt: overlap checkpoint writes with training
        # (orbax async save; commits are atomic, restart sees only
        # complete checkpoints)
        return CheckpointManager(
            os.path.join(self.dirs["ckpt"], role), max_to_keep=max_to_keep,
            async_save=bool(self.config.get("logging", {}).get(
                "async_ckpt", False)))

    def maybe_restore(self, role: str, template):
        """Restore latest state for role if a checkpoint exists.

        ``general.fresh_start`` (set when the user answers 'n' to the
        resume prompt) clears the role's stale checkpoints first so the
        run truly starts over — otherwise the old final step would be
        restored and an iteration-capped loop would exit immediately."""
        if bool(self.config.general.get("fresh_start", False)):
            import shutil

            d = os.path.join(self.dirs["ckpt"], role)
            if os.path.isdir(d) and os.listdir(d):
                print(f"fresh start: clearing stale '{role}' checkpoints "
                      f"under {d}")
                shutil.rmtree(d)
            return template, 0, self.ckpt_manager(role)
        mgr = self.ckpt_manager(role)
        out = mgr.restore_latest(template)
        if out is None:
            return template, 0, mgr
        state, step = out
        print(f"Restored {role} checkpoint at step {step}")
        return state, step, mgr

    def place(self, tree):
        """Replicate state over the mesh (no-op single device)."""
        if self.mesh is None:
            return tree
        return replicate(tree, self.mesh)

    def place_batch(self, batch):
        batch = {k: np.asarray(v) for k, v in batch.items()}
        if self.mesh is None:
            return batch
        return shard_batch(batch, self.mesh)

    def run_training(self):
        raise NotImplementedError

    def run_inference(self):
        raise NotImplementedError
