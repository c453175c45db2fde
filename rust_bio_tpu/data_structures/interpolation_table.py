"""Memoized piecewise-linear function table.

Reference parity: src/data_structures/interpolation_table.rs —
``interpolate`` (:30), ``InterpolationTable::new``/``get`` (:63-120):
values inside [min_x, max_x) are linearly interpolated from a table with
10^frac_digits resolution; outside, the function is called directly.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def interpolate(a: float, b: float, fraction: float) -> float:
    return a * (1.0 - fraction) + b * fraction


class InterpolationTable:
    def __init__(
        self,
        min_x: float,
        max_x: float,
        frac_digits: int,
        func: Callable[[float], float],
    ) -> None:
        self.func = func
        self.min_x = min_x
        self.max_x = max_x
        self.shift = 10.0 ** frac_digits
        lo = int(np.floor(min_x * self.shift))
        hi = int(np.ceil(max_x * self.shift))
        self.offset = lo
        xs = np.arange(lo, hi + 2, dtype=np.float64) / self.shift
        self.inner = np.array([func(x) for x in xs], dtype=np.float64)

    @classmethod
    def new(cls, min_x, max_x, frac_digits, func) -> "InterpolationTable":
        return cls(min_x, max_x, frac_digits, func)

    def get(self, x: float) -> float:
        if not (self.min_x <= x < self.max_x):
            return float(self.func(x))
        i = x * self.shift
        idx = int(np.floor(i)) - self.offset
        frac = i - np.floor(i)
        return interpolate(self.inner[idx], self.inner[idx + 1], frac)

    def get_batch(self, xs) -> np.ndarray:
        """Vectorized lookup (interpolation inside range, func outside)."""
        xs = np.asarray(xs, dtype=np.float64)
        inside = (xs >= self.min_x) & (xs < self.max_x)
        i = xs * self.shift
        idx = np.clip(np.floor(i).astype(np.int64) - self.offset, 0, len(self.inner) - 2)
        frac = i - np.floor(i)
        interp = interpolate(self.inner[idx], self.inner[idx + 1], frac)
        out = np.where(inside, interp, 0.0)
        if not inside.all():
            outs = [self.func(float(x)) for x in xs[~inside]]
            out[~inside] = outs
        return out
