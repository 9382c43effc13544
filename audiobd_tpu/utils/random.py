"""Deterministic seeding with an explicit key tree.

The reference seeds random/numpy/torch globally with 35
(utils/random_tools.py:5-18). JAX randomness is functional, so the
equivalent is a documented key-split tree per run:

    root(seed=35)
      ├─ "data"     host-side numpy Generator (splits, poison sampling, shuffles)
      ├─ "params"   model init
      ├─ "dropout"  per-step dropout (folded with the step counter)
      └─ "poison"   device-side poison ops (e.g. FlowMur positions)
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np

DEFAULT_SEED = 35


def root_key(seed: int = DEFAULT_SEED) -> jax.Array:
    return jax.random.PRNGKey(seed)


def named_key(seed: int, name: str) -> jax.Array:
    digest = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    return jax.random.fold_in(jax.random.PRNGKey(seed), digest)


def np_rng(seed: int = DEFAULT_SEED, name: str = "data") -> np.random.Generator:
    digest = int.from_bytes(hashlib.sha256(name.encode()).digest()[:8], "little")
    return np.random.default_rng(np.random.SeedSequence([seed, digest]))
