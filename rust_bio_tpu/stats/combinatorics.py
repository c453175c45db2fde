"""Combinations with and without replacement.

Reference parity: src/stats/combinatorics.rs:20-60 (scaled_combinations,
combinations, combinations_with_repl).
"""

from __future__ import annotations


def scaled_combinations(n: int, k: int, scale: float) -> float:
    """n-choose-k times a scaling factor, O(min(k, n-k)).

    >>> scaled_combinations(5, 3, 0.5)
    5.0
    """
    if k > n:
        return 0.0
    comb = scale
    for j in range(min(k, n - k)):
        comb /= j + 1
        comb *= n - j
    return comb


def combinations(n: int, k: int) -> float:
    """Binomial coefficient n over k.

    >>> combinations(5, 3)
    10.0
    """
    return scaled_combinations(n, k, 1.0)


def combinations_with_repl(n: int, k: int) -> float:
    """Combinations with replacement.

    >>> combinations_with_repl(5, 3)
    35.0
    """
    return combinations(n + k - 1, k)
