"""Interval trees: augmented AVL and array-backed (cgranges/IITree style).

Reference parity: src/data_structures/interval_tree/ —
``avl_interval_tree.rs`` (augmented AVL, iterator-based find/find_mut,
:170-220) and ``array_backed_interval_tree.rs`` (sorted array + max-end
augmentation, insert/index/find/find_into, :102-220). Intervals are
half-open; overlap = ``a.start < b.end and b.start < a.end``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Generic, Iterator, List, Optional, Tuple, TypeVar, Union

import numpy as np

from rust_bio_tpu.utils.interval import Interval

D = TypeVar("D")

IntervalLike = Union[Interval, Tuple[int, int], range]


def _to_interval(iv: IntervalLike) -> Interval:
    if isinstance(iv, Interval):
        return iv
    if isinstance(iv, range):
        return Interval(iv.start, iv.stop)
    if isinstance(iv, tuple):
        return Interval(iv[0], iv[1])
    if isinstance(iv, int):  # point query
        return Interval(iv, iv + 1)
    raise TypeError(f"cannot interpret {iv!r} as interval")


@dataclass
class Entry(Generic[D]):
    """A found (interval, data) pair."""

    _interval: Interval
    _data: Any

    def interval(self) -> Interval:
        return self._interval

    def data(self) -> Any:
        return self._data


class _Node:
    __slots__ = ("interval", "data", "left", "right", "height", "max_end")

    def __init__(self, interval: Interval, data) -> None:
        self.interval = interval
        self.data = data
        self.left: Optional["_Node"] = None
        self.right: Optional["_Node"] = None
        self.height = 1
        self.max_end = interval.end


def _h(n: Optional[_Node]) -> int:
    return n.height if n else 0


def _me(n: Optional[_Node]) -> int:
    return n.max_end if n else -(1 << 62)


def _update(n: _Node) -> None:
    n.height = 1 + max(_h(n.left), _h(n.right))
    n.max_end = max(n.interval.end, _me(n.left), _me(n.right))


def _rot_right(y: _Node) -> _Node:
    x = y.left
    y.left = x.right
    x.right = y
    _update(y)
    _update(x)
    return x


def _rot_left(x: _Node) -> _Node:
    y = x.right
    x.right = y.left
    y.left = x
    _update(x)
    _update(y)
    return y


def _balance(n: _Node) -> _Node:
    _update(n)
    bf = _h(n.left) - _h(n.right)
    if bf > 1:
        if _h(n.left.left) < _h(n.left.right):
            n.left = _rot_left(n.left)
        return _rot_right(n)
    if bf < -1:
        if _h(n.right.right) < _h(n.right.left):
            n.right = _rot_right(n.right)
        return _rot_left(n)
    return n


class IntervalTree(Generic[D]):
    """Augmented AVL interval tree (avl_interval_tree.rs)."""

    def __init__(self) -> None:
        self._root: Optional[_Node] = None
        self._len = 0

    @classmethod
    def new(cls) -> "IntervalTree":
        return cls()

    def insert(self, interval: IntervalLike, data) -> None:
        iv = _to_interval(interval)

        def rec(node: Optional[_Node]) -> _Node:
            if node is None:
                return _Node(iv, data)
            if (iv.start, iv.end) <= (node.interval.start, node.interval.end):
                node.left = rec(node.left)
            else:
                node.right = rec(node.right)
            return _balance(node)

        self._root = rec(self._root)
        self._len += 1

    def find(self, interval: IntervalLike) -> Iterator[Entry]:
        iv = _to_interval(interval)
        stack = [self._root] if self._root else []
        while stack:
            node = stack.pop()
            if node is None or node.max_end <= iv.start:
                continue
            if node.left:
                stack.append(node.left)
            if node.interval.start < iv.end:
                if node.right:
                    stack.append(node.right)
                if node.interval.end > iv.start:
                    yield Entry(node.interval, node.data)

    def find_mut(self, interval: IntervalLike) -> Iterator[Entry]:
        return self.find(interval)

    def __len__(self) -> int:
        return self._len

    def __iter__(self) -> Iterator[Entry]:
        def rec(node):
            if node:
                yield from rec(node.left)
                yield Entry(node.interval, node.data)
                yield from rec(node.right)

        return rec(self._root)


class ArrayBackedIntervalTree(Generic[D]):
    """Implicit interval tree: sorted arrays + max-end augmentation
    (array_backed_interval_tree.rs; cgranges-style but with a simple
    binary-search sweep, fully vectorizable)."""

    def __init__(self) -> None:
        self._items: List[Tuple[Interval, Any]] = []
        self._starts: Optional[np.ndarray] = None
        self._ends: Optional[np.ndarray] = None
        self._max_end_prefix: Optional[np.ndarray] = None
        self._indexed = False

    @classmethod
    def new(cls) -> "ArrayBackedIntervalTree":
        return cls()

    @classmethod
    def from_iter(cls, it) -> "ArrayBackedIntervalTree":
        t = cls()
        for iv, data in it:
            t.insert(iv, data)
        t.index()
        return t

    def insert(self, interval: IntervalLike, data) -> None:
        self._items.append((_to_interval(interval), data))
        self._indexed = False

    def index(self) -> None:
        self._items.sort(key=lambda t: (t[0].start, t[0].end))
        self._starts = np.array([iv.start for iv, _ in self._items], dtype=np.int64)
        ends = np.array([iv.end for iv, _ in self._items], dtype=np.int64)
        self._ends = ends
        self._max_end_prefix = (
            np.maximum.accumulate(ends) if len(ends) else ends
        )
        self._indexed = True

    def _check_indexed(self) -> None:
        if not self._indexed:
            raise RuntimeError("This interval tree has not been indexed yet. Call `index()` first.")

    def find(self, interval: IntervalLike) -> List[Entry]:
        out: List[Entry] = []
        self.find_into(interval, out)
        return out

    def find_into(self, interval: IntervalLike, results: List[Entry]) -> None:
        self._check_indexed()
        iv = _to_interval(interval)
        results.clear()
        n = len(self._items)
        if n == 0:
            return
        # rightmost candidate: first start >= iv.end
        hi = int(np.searchsorted(self._starts, iv.end, side="left"))
        # leftmost candidate: first index whose running max end > iv.start
        lo = int(np.searchsorted(self._max_end_prefix[:hi], iv.start, side="right"))
        for k in range(lo, hi):
            ivk, data = self._items[k]
            if ivk.end > iv.start:
                results.append(Entry(ivk, data))

    def __len__(self) -> int:
        return len(self._items)
