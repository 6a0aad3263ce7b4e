"""Checkpointing via orbax: whole-train-state pytrees, latest-by-step.

Replaces the reference's ``.pth`` files with latest-by-filename-number
parsing (experiments/experiment.py:39-145) and its gamma-smuggled-through-
optimizer-param-groups trick (SURVEY.md §5.3): here the full train state —
params, optimizer states, buffers, step, controller scalars — is one pytree
saved/restored wholesale.  Roles (behavior "reg_ckpt", "flow_ckpt", synth
model) become subdirectories.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class CheckpointManager:
    """One role (model family) per instance; steps index the saves."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = _manager(self.directory, max_to_keep)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        import orbax.checkpoint as ocp

        if int(step) in (self._mgr.all_steps() or []):
            return False  # idempotent: step already on disk
        saved = self._mgr.save(int(step),
                               args=ocp.args.StandardSave(state),
                               force=force)
        self._mgr.wait_until_finished()
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> Optional[Tuple[Any, int]]:
        """Restore the newest checkpoint into the template's structure."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template)
        state = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        return state, int(step)

    def close(self):
        self._mgr.close()
