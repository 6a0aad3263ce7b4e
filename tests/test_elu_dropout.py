"""Fused ELU+dropout (ops/pallas/elu_dropout.py) — CPU-side contracts.

The Mosaic kernel itself only lowers on TPU (pltpu.prng_* have no CPU
lowering, interpret mode included); its numerics were verified on-chip
(drop fraction, kept-value scaling, backward mask regeneration — see the
module docstring's measurement log).  These tests pin the parts that
must hold everywhere: the XLA fallback's dropout semantics, the
dispatch/fallback decision, and that the RNB's 'pallas' impl is
param-tree-compatible with the default.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.ops.nn import VunetRNB
from behavior_driven_video_synthesis_tpu.ops.pallas.elu_dropout import (
    _keep_params,
    _pick_block_rows,
    elu_dropout,
    pallas_applicable,
)


def test_fallback_semantics_cpu():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, 128))
    # rate edges
    np.testing.assert_allclose(np.asarray(elu_dropout(x, key, 0.0)),
                               np.asarray(jax.nn.elu(x)))
    assert float(jnp.sum(jnp.abs(elu_dropout(x, key, 1.0)))) == 0.0
    # unbiasedness: mean over many keys ~= elu(x)
    rate = 0.2
    ys = jnp.stack([elu_dropout(x, jax.random.PRNGKey(i), rate)
                    for i in range(400)])
    e = jax.nn.elu(x)
    rel = float(jnp.mean(jnp.abs(ys.mean(0) - e)) / jnp.mean(jnp.abs(e)))
    assert rel < 0.05, rel
    # dropped fraction near rate, survivors = elu * 1/keep
    y = elu_dropout(x, key, rate)
    thresh, scale = _keep_params(rate)
    dropped = np.asarray(y == 0)
    assert abs(dropped.mean() - rate) < 0.05
    kept = ~dropped & (np.abs(np.asarray(e)) > 1e-3)
    np.testing.assert_allclose(np.asarray(y)[kept],
                               np.asarray(e)[kept] * scale, rtol=1e-5)


def test_fallback_gradient_regenerates_mask():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (32, 128))
    rate = 0.1
    y = elu_dropout(x, key, rate)
    g = jax.grad(lambda x: jnp.sum(elu_dropout(x, key, rate)))(x)
    # same key -> same mask in backward: zero outputs get zero grads and
    # kept positions carry scale * elu'(x)
    dropped = np.asarray(y == 0)
    xf = np.asarray(x)
    e = np.asarray(jax.nn.elu(x))
    amb = np.abs(e) <= 1e-3
    _, scale = _keep_params(rate)
    exp_g = np.where(dropped, 0.0, scale * np.where(xf > 0, 1.0, np.exp(xf)))
    np.testing.assert_allclose(np.asarray(g)[~amb], exp_g[~amb], atol=1e-5)


def test_dispatch_decision():
    # CPU backend: never the kernel
    assert not pallas_applicable(jnp.zeros((12, 64, 64, 32), jnp.bfloat16))
    # tiny tensors excluded even where backend check would pass
    assert _pick_block_rows(49) is None          # not a multiple of 8
    assert _pick_block_rows(48) == 48
    assert _pick_block_rows(768) == 768          # single block
    assert _pick_block_rows(196608) == 2048


def test_rnb_pallas_impl_param_compatible():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 32))
    a = jax.random.normal(jax.random.fold_in(k, 1), (2, 16, 16, 32))
    trees = {}
    for impl in ("flax", "pallas"):
        m = VunetRNB(channels=32, residual=True, dropout_prob=0.05,
                     dropout_impl=impl, dtype=jnp.float32)
        v = m.init({"params": k}, x, a, train=False)
        trees[impl] = jax.tree_util.tree_structure(v)
        # train path runs (CPU -> XLA fallback) and is finite
        y = m.apply(v, x, a, train=True,
                    rngs={"dropout": jax.random.PRNGKey(7)})
        assert bool(jnp.all(jnp.isfinite(y)))
    assert trees["flax"] == trees["pallas"]


def test_rnb_pallas_impl_eval_matches_flax():
    """deterministic (train=False) path is identical across impls — the
    impl only changes training-time masks, so checkpoints can flip it."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 8, 16))
    outs = []
    for impl in ("flax", "pallas"):
        m = VunetRNB(channels=16, dropout_prob=0.05, dropout_impl=impl,
                     dtype=jnp.float32)
        v = m.init({"params": k}, x, train=False)
        outs.append(np.asarray(m.apply(v, x, train=False)))
    np.testing.assert_array_equal(outs[0], outs[1])
