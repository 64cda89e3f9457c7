"""Small statistics helpers for evaluation reporting (no jax dependency)."""

from __future__ import annotations

import math
from typing import List


def wilson_ci(successes: int, n: int, z: float = 1.96) -> List[float]:
    """Wilson score interval for a binomial proportion (default 95%).

    Used for success-rate error bars in the eval matrix
    (run/eval_matrix.py); preferred over the normal approximation because
    it behaves at p near 0/1 and small n (e.g. S_rate 1.00 on 300 episodes
    yields [0.987, 1.0], not a degenerate [1.0, 1.0]).
    """
    if n == 0:
        return [0.0, 1.0]
    phat = successes / n
    denom = 1 + z * z / n
    center = (phat + z * z / (2 * n)) / denom
    half = z * math.sqrt(phat * (1 - phat) / n + z * z / (4 * n * n)) / denom
    return [round(center - half, 4), round(center + half, 4)]
