"""Packed-matmul fused RNB Pallas kernel: exactness vs the flax VunetRNB
across channel widths (interpret mode on the CPU mesh).

Run from the repo root: python -m pytest attic/test_pallas_rnb.py
(the kernel module lives beside this file, not in the package tree).
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # interpret-mode kernel test

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from behavior_driven_video_synthesis_tpu.ops.nn import VunetRNB
from pallas_rnb import (
    build_block_matrices,
    fused_rnb,
    rnb_reference,
)


@pytest.mark.parametrize("shape", [(2, 32, 32, 32), (1, 16, 32, 64),
                                   (2, 16, 16, 128)])
def test_fused_rnb_matches_flax(shape):
    B, H, W, C = shape
    x = (jr.normal(jr.PRNGKey(C), shape, jnp.float32) * 0.5).astype(
        jnp.bfloat16)
    m = VunetRNB(channels=C, dtype=jnp.bfloat16)
    p = m.init(jr.PRNGKey(1), x)["params"]["NormConv2d_0"]
    ref = np.asarray(
        m.apply({"params": {"NormConv2d_0": p}}, x), np.float32)
    out = np.asarray(fused_rnb(x, p, interpret=True, block_rows=8),
                     np.float32)
    # bf16 rounding bound: both paths round conv outputs to bf16
    assert np.abs(out - ref).max() < 0.05
    # and against the f32-accumulating oracle, much tighter
    orc = np.asarray(rnb_reference(x, p), np.float32)
    assert np.abs(out - orc).max() < 0.02


def test_block_matrices_cover_every_tap_once():
    """Each (output subpixel, tap) pair appears in exactly one block matrix
    (otherwise taps would be dropped or double-counted)."""
    for C in (32, 64, 128):
        k = np.random.RandomState(C).randn(3, 3, C, C).astype(np.float32)
        mats = build_block_matrices(k)
        pack = 128 // C
        seen = set()
        for s, M in mats:
            for p in range(pack):
                for g in range(pack):
                    blk = M[:, g * C:(g + 1) * C, p * C:(p + 1) * C]
                    if np.any(blk != 0):
                        dw = g - (p - 1) - s
                        assert 0 <= dw < 3
                        assert (p, dw) not in seen
                        seen.add((p, dw))
                        np.testing.assert_array_equal(blk, k[:, dw])
        assert len(seen) == pack * 3


def test_zero_padding_at_image_edges():
    """SAME-conv zero padding: a bright pixel at the image border must not
    wrap around to the opposite edge."""
    C, H, W = 32, 16, 16
    x = jnp.zeros((1, H, W, C), jnp.bfloat16)
    x = x.at[0, 0, 0, :].set(4.0)
    x = x.at[0, H - 1, W - 1, :].set(4.0)
    m = VunetRNB(channels=C, dtype=jnp.bfloat16)
    p = m.init(jr.PRNGKey(0), x)["params"]["NormConv2d_0"]
    out = np.asarray(fused_rnb(x, p, interpret=True, block_rows=8),
                     np.float32)
    ref = np.asarray(rnb_reference(x, p), np.float32)
    np.testing.assert_allclose(out, ref, atol=0.02)
