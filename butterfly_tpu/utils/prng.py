"""Random number helpers.

Replacement for the reference's xoshiro256+/splitmix64 RNG
(src/rand.c:20-72, src/xoshiro256plus.c, src/splitmix64.c): host-side
randomness uses numpy Generators, device-side uses jax PRNG keys. A single
`seed()` seeds both worlds deterministically, preserving the reference's
reproducible-run property.
"""

from __future__ import annotations

import numpy as np
import jax

_HOST_RNG = np.random.default_rng(0)
_KEY = jax.random.key(0)


def seed(s: int) -> None:
    """Seed host and device RNG (reference: bfSeed, src/rand.c:20-33)."""
    global _HOST_RNG, _KEY
    _HOST_RNG = np.random.default_rng(s)
    _KEY = jax.random.key(s)


def host_rng() -> np.random.Generator:
    return _HOST_RNG


def next_key() -> jax.Array:
    """Split and return a fresh jax PRNG key."""
    global _KEY
    _KEY, sub = jax.random.split(_KEY)
    return sub


def randn(*shape: int, dtype=np.float64) -> np.ndarray:
    """Host-side standard normals (reference: bfRealRandn, src/rand.c:55-72)."""
    return _HOST_RNG.standard_normal(shape).astype(dtype)


def crandn(*shape: int, dtype=np.complex128) -> np.ndarray:
    """Host-side complex standard normals (reference: bfComplexRandn)."""
    z = _HOST_RNG.standard_normal(shape) + 1j * _HOST_RNG.standard_normal(shape)
    return (z / np.sqrt(2.0)).astype(dtype)
