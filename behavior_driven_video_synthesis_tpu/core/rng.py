"""Explicit RNG-key plumbing.

The reference relies on a single global torch RNG shared across data sampling
and model sampling (SURVEY.md §5.2).  Here every source of randomness gets an
explicit `jax.random` key.  `KeySeq` is a tiny convenience for host-side code
that wants a stream of fresh keys without manual bookkeeping; jitted code
should thread keys functionally instead.
"""
from __future__ import annotations

import jax


class KeySeq:
    """A mutable stream of PRNG keys for host-side orchestration code.

    >>> ks = KeySeq(42)
    >>> k1 = ks()          # fresh key
    >>> k2, k3 = ks(2)     # two fresh keys
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self, n: int | None = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs

    def fold_in(self, data: int) -> "KeySeq":
        return KeySeq(jax.random.fold_in(self._key, data))

    @property
    def key(self):
        return self._key


def rbg_key(key):
    """Re-wrap a PRNG key under the ``rbg`` implementation.

    Under the default threefry2x32 PRNG, generating a dropout mask for every
    activation tensor costs a long chain of scalar ALU ops per tensor; on TPU
    the ``rbg`` implementation lowers random-bit generation to one hardware
    ``rng-bit-generator`` HLO instead.  Measured on the cvbae-256 train step
    (B=12, dropout_prob=0.05, the reference production value,
    /root/reference/config/shape_and_pose_net.yaml:52) the threefry masks
    cost ~25% of the whole step (CVBAE_RECONCILE.json).  The mask
    distribution is unchanged — only the stream differs — so train steps
    re-key their dropout collections through this.
    """
    if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = data.ravel()
    return jax.random.wrap_key_data(
        jax.numpy.tile(data, 4)[:4], impl="rbg")
