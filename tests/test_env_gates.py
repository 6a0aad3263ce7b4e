"""Environment-gate assertions: make optional-dependency skips LOUD.

Several parity claims (PARITY.md) rest on tests gated behind
``pytest.importorskip`` — torch oracles (test_convert.py,
test_reference_parity.py living tier), cv2 rasterization parity
(geometry), h5py dataset fixtures.  A silent skip regression (e.g. a broken
torch install) would leave PARITY.md claiming verification that no longer
runs.  This module pins the EXPECTED environment: each dependency listed in
``EXPECTED_AVAILABLE`` must import, so a gated tier vanishing flips the
suite red instead of silently shrinking it.

If a dependency is intentionally dropped from the image, update this list
AND the corresponding PARITY.md claims in the same commit.
"""
import importlib
import os

import pytest

# dependencies whose presence PARITY.md claims depend on (state the gate
# inline where used; this is the central loud check)
EXPECTED_AVAILABLE = [
    "torch",   # test_convert.py, test_reference_parity.py living tier
    "cv2",     # geometry/stickman host-raster parity, data prep
    "h5py",    # human36m fixtures, prep round-trip
    "yaml",    # config system
    "scipy",   # FID sqrtm, geometry
    "PIL",     # image IO
]

# the living-reference tier additionally needs the reference checkout
REFERENCE_ROOT = os.environ.get("BDVS_REFERENCE_ROOT", "/root/reference")


@pytest.mark.parametrize("mod", EXPECTED_AVAILABLE)
def test_expected_dependency_importable(mod):
    importlib.import_module(mod)


def test_reference_checkout_present_for_living_tier():
    """The living-reference parity tier (test_reference_parity.py) needs
    /root/reference; absent it, only the committed-golden tier runs.  This
    is expected to hold in the build image — if the checkout moves, set
    BDVS_REFERENCE_ROOT."""
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout absent — golden tier still covers "
                    "parity; living tier inactive (expected only outside "
                    "the build image)")
    assert os.path.isfile(os.path.join(REFERENCE_ROOT, "models",
                                       "vunets.py"))


def test_torch_gated_tiers_collected():
    """Regression guard: the torch-gated test files must still be
    collectible and non-trivially sized (importorskip at module level would
    silently drop them from the suite)."""
    here = os.path.dirname(__file__)
    for fname, min_tests in (("test_convert.py", 4),
                             ("test_reference_parity.py", 18),
                             ("test_reference_train_parity.py", 4)):
        path = os.path.join(here, fname)
        assert os.path.isfile(path), fname
        text = open(path).read()
        n_tests = text.count("\ndef test_") + text.count("\n    def test_")
        assert n_tests >= min_tests, (fname, n_tests)
