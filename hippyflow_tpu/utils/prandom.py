"""PRNG management (hp.parRandom equivalent).

The reference uses a global parallel RNG whose draws are broadcast from
collective-rank 0 so every rank applies the same random probe
(`activeSubspaceProjector.py:437-443`).  With jax PRNG keys this collapses to
a no-op: deriving the same key on every device/process yields identical
draws, so "broadcast of Omega" is replaced by key determinism.

`KeyChain` provides an explicit, splittable stream so stateful-looking
reference call sites (`hp.parRandom.normal(1., Omega)`) map onto functional
key threading without plumbing keys through every signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config


class KeyChain:
    """A mutable stream of PRNG keys: each ``next_key()`` is independent."""

    def __init__(self, seed_or_key=0):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def normal(self, shape, dtype=None, sigma: float = 1.0):
        dtype = dtype or config.default_dtype()
        return sigma * jax.random.normal(self.next_key(), shape, dtype=dtype)

    def uniform(self, shape, lo=0.0, hi=1.0, dtype=None):
        dtype = dtype or config.default_dtype()
        return jax.random.uniform(
            self.next_key(), shape, dtype=dtype, minval=lo, maxval=hi
        )
