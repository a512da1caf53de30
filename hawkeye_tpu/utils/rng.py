"""Deterministic seeding discipline.

Reference: ``utils/utils.py:102-108`` seeds python/numpy/torch + cudnn flags
(``train.py:77-82``). The JAX analogue: seed python/numpy for host-side
shuffling/augmentation and derive an explicit ``jax.random`` key tree for all
device randomness. XLA is deterministic by construction given fixed keys, so
no cudnn-style flags are needed.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int):
    """Seed host RNGs and return a root JAX PRNG key."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class KeySequence:
    """An explicitly-stepped stream of PRNG keys (one per step/epoch)."""

    def __init__(self, root_key):
        self._key = root_key

    def next(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub
