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
