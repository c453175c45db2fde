"""Inclusive/exclusive scans (reference parity: src/utils/mod.rs scan/prescan).

Host variants operate on lists/arrays; accelerated paths should prefer
``jax.lax.associative_scan`` / ``jnp.cumsum`` directly.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, TypeVar

T = TypeVar("T")


def scan(a: Sequence[T], op: Callable[[T, T], T]) -> List[T]:
    """Inclusive scan: out[i] = op(out[i-1], a[i])."""
    out = list(a)
    for i in range(1, len(out)):
        out[i] = op(out[i - 1], out[i])
    return out


def prescan(a: Sequence[T], neutral: T, op: Callable[[T, T], T]) -> List[T]:
    """Exclusive scan: out[0] = neutral, out[i] = op(out[i-1], a[i-1])."""
    out = list(a)
    s = neutral
    for i, v in enumerate(out):
        out[i] = s
        s = op(s, v)
    return out
