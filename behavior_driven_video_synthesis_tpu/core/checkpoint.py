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
    """One role (model family) per instance; steps index the saves.

    ``async_save=True`` overlaps the disk write with training: ``save``
    returns as soon as the state is snapshotted (orbax's async
    checkpointer copies device arrays before returning), and the write
    completes on a background thread.  ``flush()``/``close()`` (and the
    next ``save``, internally serialized by orbax) join it.  Restores
    always see a complete checkpoint: orbax commits atomically via a
    rename, so a crash mid-write leaves only the previous step visible.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self.async_save = bool(async_save)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = _manager(self.directory, max_to_keep)
        if self.async_save:
            # join any in-flight write before interpreter shutdown tears
            # down orbax's background executors (atexit runs before
            # threading/executor shutdown, so the commit can still finish)
            import atexit

            atexit.register(self._atexit_flush)

    def _atexit_flush(self):
        try:
            self._mgr.wait_until_finished()
        except Exception:
            pass  # already closed / nothing in flight

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        import orbax.checkpoint as ocp

        if int(step) in (self._mgr.all_steps() or []):
            return False  # idempotent: step already on disk
        saved = self._mgr.save(int(step),
                               args=ocp.args.StandardSave(state),
                               force=force)
        if not self.async_save:
            self._mgr.wait_until_finished()
        return bool(saved)

    def flush(self):
        """Join any in-flight async save."""
        self._mgr.wait_until_finished()

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
        self._mgr.wait_until_finished()
        self._mgr.close()
