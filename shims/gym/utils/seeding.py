"""gym.utils.seeding.np_random stand-in (track_1v1.py:130 calls it from
`env.seed()`; the returned RandomState is stored but — per SURVEY.md §2.1 —
never actually used by the reference env, so a plain RandomState suffices)."""

import numpy as np


def np_random(seed=None):
    if seed is not None and not (isinstance(seed, int) and seed >= 0):
        raise ValueError(f"Seed must be a non-negative integer: {seed}")
    rng = np.random.RandomState(seed)
    return rng, seed
