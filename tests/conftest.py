"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; see __graft_entry__.py).  Must run before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers a TPU backend regardless of
# JAX_PLATFORMS; config.update after import is the reliable override.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Tests measured >~10s on the 1-CPU box (pytest --durations; the cost is
# flax tracing / eager dispatch of big models, which no compilation cache
# can absorb).  They are auto-marked `slow` here — one central list instead
# of scattered decorators — so the default fast tier (`-m "not e2e and not
# slow"`) stays under ~5 min while `make test` still runs everything.
_SLOW = {
    "test_vunet_oracle.py",                     # whole module: numpy oracle
    "test_vunet_training.py::TestLaplacianPerceptual::test_cvbae_step_with_laplacian",
    "test_vunet_training.py::test_remat_is_numerically_identical",
    "test_vunet_training.py::test_grad_accum_matches_manual_average",
    "test_dormant_models.py::TestRIM",
    "test_dormant_models.py::TestConcatFlow",
    "test_dormant_models.py::TestSmallModules::test_resnet_block_2d",
    "test_dormant_models.py::TestSmallModules::test_self_attention_2d",
    "test_viz_and_gan.py::TestGAN",
    "test_viz_and_gan.py::TestVisualizeTransfer::test_generates_videos",
    "test_viz_and_gan.py::test_behavior_startpose_grid",
    "test_pipeline.py::test_full_pipeline_one_jit",
    "test_pipeline.py::test_chunked_vunet_stage_pads_awkward_n",
    "test_pipeline.py::test_chunked_vunet_stage_matches_unchunked",
    "test_vunet.py::TestJit::test_jit_train_and_transfer",
    "test_vunet.py::TestInplaneBranch::test_box_factor_shapes",
    "test_convert.py::test_vunet_alter_conversion_roundtrip",
    "test_convert.py::test_vunet_org_conversion_roundtrip",
    "test_train_behavior.py::TestHybridSharding",
    "test_train_behavior.py::TestFlowStage::test_flow_trains_on_frozen_net",
    "test_train_behavior.py::TestBehaviorTraining",
    "test_flow.py::TestRQSCoupling",
    "test_flow.py::TestFullFlow",
    "test_flow.py::TestCoupling::test_logdet_vs_jacobian",
    "test_flow.py::TestConditionalFlow",
    "test_flow.py::TestMADE::test_autoregressive_jacobian",
    "test_behavior_model.py::TestProbes::test_all_probe_shapes",
    "test_figures.py::test_nearest_neighbour_figure",
    "test_reference_parity.py::test_living_reference_realistic_vunet_org",
    "test_multichip_256.py",                    # whole module: 256px compiles
    "test_reference_train_parity.py",           # whole module: N-step lockstep
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("tests/", "", 1)
        parts = nodeid.split("::")
        prefixes = {parts[0], "::".join(parts[:2]),
                    "::".join(parts[:3]).split("[")[0]}
        if prefixes & _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
