"""Adaptive quadrature hill-climbing the density maximum.

Reference parity: src/stats/probs/adaptive_integration.rs —
``ln_integrate_exp`` (:46-144): binary search toward the (assumed unimodal)
maximum caching grid points, one extra point in the abandoned arm, a small
linspace refinement around the optimum, then trapezoidal grid integration.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from rust_bio_tpu.stats.probs import LogProb


def ln_integrate_exp(
    density: Callable[[float], float],
    min_point: float,
    max_point: float,
    max_resolution: float,
) -> LogProb:
    probs: Dict[float, float] = {}

    def grid_point(point: float) -> float:
        probs[point] = float(density(point))
        return point

    def middle_grid_point(left: float, right: float) -> float:
        return (right + left) / 2.0

    left = grid_point(min_point)
    right = grid_point(max_point)
    first_middle = None
    middle = None

    while ((right - left) >= max_resolution and left < right) or middle is None:
        middle = grid_point(middle_grid_point(left, right))
        if first_middle is None:
            first_middle = middle
        if probs[left] > probs[right]:
            right = middle
        else:
            left = middle

    if middle < first_middle:
        grid_point(middle_grid_point(first_middle, max_point))
    else:
        grid_point(middle_grid_point(min_point, first_middle))

    lo = max(middle - max_resolution * 3.0, min_point)
    hi = min(middle + max_resolution * 3.0, max_point)
    for p in list(np.linspace(lo, middle, 4))[:3] + list(
        np.linspace(middle, hi, 4)
    )[1:]:
        grid_point(float(p))

    grid = sorted(probs.keys())
    return LogProb.ln_trapezoidal_integrate_grid_exp(
        lambda _, g: probs[g], grid
    )
