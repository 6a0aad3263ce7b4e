"""Checkpoint manager round-trip and restart semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.core.checkpoint import (
    CheckpointManager,
)
from behavior_driven_video_synthesis_tpu.train.state import ModuleState


def _make_state(seed):
    key = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(key, (4, 4)),
              "b": jnp.zeros(4)}
    tx = optax.adam(1e-3)
    return ModuleState.create({"params": params}, tx), tx


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        state, tx = _make_state(0)
        mgr = CheckpointManager(str(tmp_path / "role"))
        assert mgr.latest_step() is None
        assert mgr.save(10, state)
        out = mgr.restore_latest(state)
        assert out is not None
        restored, step = out
        assert step == 10
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(state.params["w"]))

    def test_latest_wins_and_idempotent(self, tmp_path):
        s1, tx = _make_state(1)
        s2, _ = _make_state(2)
        mgr = CheckpointManager(str(tmp_path / "role"))
        assert mgr.save(1, s1)
        assert mgr.save(5, s2)
        assert not mgr.save(5, s1)  # idempotent: step exists
        restored, step = mgr.restore_latest(s1)
        assert step == 5
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(s2.params["w"]))

    def test_max_to_keep(self, tmp_path):
        s, tx = _make_state(3)
        mgr = CheckpointManager(str(tmp_path / "role"), max_to_keep=2)
        for step in [1, 2, 3, 4]:
            mgr.save(step, s)
        steps = mgr._mgr.all_steps()
        assert len(steps) <= 2 and max(steps) == 4

    def test_async_save_restore(self, tmp_path):
        """async_save returns before the write completes; flush() joins it
        and the restored state is byte-identical."""
        s1, tx = _make_state(5)
        s2, _ = _make_state(6)
        mgr = CheckpointManager(str(tmp_path / "role"), async_save=True)
        assert mgr.save(1, s1)
        assert mgr.save(2, s2)  # orbax serializes with the pending save
        mgr.flush()
        restored, step = mgr.restore_latest(s1)
        assert step == 2
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(s2.params["w"]))
        mgr.close()
        # a fresh manager (fresh process stand-in) sees both commits
        mgr2 = CheckpointManager(str(tmp_path / "role"))
        assert mgr2.latest_step() == 2

    def test_apply_gradients_enable_switch(self):
        state, tx = _make_state(4)
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        frozen = state.apply_gradients(tx, grads,
                                       enabled=jnp.asarray(False))
        for a, b in zip(jax.tree_util.tree_leaves(frozen.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        moved = state.apply_gradients(tx, grads, enabled=jnp.asarray(True))
        assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                   for a, b in zip(jax.tree_util.tree_leaves(moved.params),
                                   jax.tree_util.tree_leaves(state.params)))


@pytest.mark.e2e
def test_graft_entry_dryrun_multichip():
    """The driver-facing multi-chip dryrun: behavior step under dp8 and
    dp4xtp2, and the cvbae image step under dp8, on the virtual mesh."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


# Wall-clock ceiling for the DEFAULT dryrun matrix (BDVS_DRYRUN_FULL
# unset) on this 1-vCPU box.  Calibration (round 5): the matrix measures
# ~245s locally after the compile-cost cuts (backend optimization level
# 0 for every layout compile + the cvbae family at 16px + bs=8); the
# MEASURED driver-vs-local factor is ~1.5x (r4: 296s local <-> 444.7s
# driver), and the driver kills at ~500s — so 280s local protects ~420s
# driver with real headroom on both sides.  If this assertion fires, cut
# compile cost (gate extras behind BDVS_DRYRUN_FULL, shrink model dims)
# BEFORE the driver artifact goes red again.
DRYRUN_BUDGET_S = 280


@pytest.mark.e2e
def test_graft_entry_dryrun_driver_topology():
    """Invoke dryrun_multichip via a fresh ``python -c`` process with NO
    platform env vars set — exactly the process topology the driver uses.
    Round 1's in-process test ran after conftest had already switched
    platforms and missed a backend-bootstrap-order bug (MULTICHIP_r01 red).
    Also asserts the run fits the driver wall-clock budget (MULTICHIP_r03
    went red on time, not correctness)."""
    import os
    import subprocess
    import sys
    import time

    root = os.path.join(os.path.dirname(__file__), "..")
    code = (
        "import sys; sys.path.insert(0, {root!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    ).format(root=os.path.abspath(root))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "BDVS_DRYRUN_FULL")}
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True,
                       timeout=DRYRUN_BUDGET_S + 120)
    elapsed = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-4000:]
    for line in ("dp8: OK", "dp4xtp2: OK", "cvbae dp8: OK",
                 "cvbae dp2xspatial4: OK", "pipeline dp8: OK",
                 "flow fsdp8: OK", "mtvae dp8: OK",
                 "org-vunet dp2xspatial: OK", "cvbae+gan dp8: OK",
                 "grad_accum2 x fsdp8: OK"):
        assert line in r.stdout, (line, r.stdout)
    assert elapsed < DRYRUN_BUDGET_S, (
        f"dryrun took {elapsed:.0f}s — over the {DRYRUN_BUDGET_S}s budget "
        f"(driver kills at ~500s; see MULTICHIP_r03).  Per-layout timings:\n"
        f"{r.stdout}")
