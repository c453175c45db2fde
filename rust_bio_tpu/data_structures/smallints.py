"""Small-integer vector with a big-value escape hatch.

Reference parity: src/data_structures/smallints.rs:99-145 (`SmallInts` —
a Vec of a small int type plus a BTreeMap for rare large values; backs the
compressed LCP array).

TPU-native take: a numpy int8 array plus a dict for the rare escapes — same
asymptotics, array-friendly storage.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np


class SmallInts:
    """i8-backed integer vector; values outside i8 go to an overflow dict."""

    _SENTINEL = np.iinfo(np.int8).min  # marks "look in bigints"

    def __init__(self) -> None:
        self._small = np.zeros(0, dtype=np.int8)
        self._n = 0
        self._big: Dict[int, int] = {}

    # ---- constructors ----

    @classmethod
    def from_elem(cls, v: int, n: int) -> "SmallInts":
        s = cls()
        s._reserve(n)
        s._n = n
        if cls._fits(v):
            s._small[:n] = v
        else:
            s._small[:n] = cls._SENTINEL
            s._big = {i: v for i in range(n)}
        return s

    @classmethod
    def from_iter(cls, values) -> "SmallInts":
        s = cls()
        for v in values:
            s.push(int(v))
        return s

    # ---- core ----

    @staticmethod
    def _fits(v: int) -> bool:
        return -127 <= v <= 127  # i8 range minus the sentinel

    def _reserve(self, n: int) -> None:
        if n > len(self._small):
            grown = np.zeros(max(n, 2 * len(self._small) + 8), dtype=np.int8)
            grown[: self._n] = self._small[: self._n]
            self._small = grown

    def __len__(self) -> int:
        return self._n

    def get(self, i: int) -> Optional[int]:
        if i >= self._n:
            return None
        v = int(self._small[i])
        if v == self._SENTINEL:
            return self._big[i]
        return v

    def push(self, v: int) -> None:
        self._reserve(self._n + 1)
        if self._fits(v):
            self._small[self._n] = v
        else:
            self._small[self._n] = self._SENTINEL
            self._big[self._n] = v
        self._n += 1

    def set(self, i: int, v: int) -> None:
        assert i < self._n
        if self._fits(v):
            if int(self._small[i]) == self._SENTINEL:
                self._big.pop(i, None)
            self._small[i] = v
        else:
            self._small[i] = self._SENTINEL
            self._big[i] = v

    def iter(self) -> Iterator[int]:
        for i in range(self._n):
            yield self.get(i)  # type: ignore[misc]

    def decompress(self) -> List[int]:
        return list(self.iter())

    def __iter__(self) -> Iterator[int]:
        return self.iter()

    def __eq__(self, other: object) -> bool:
        if isinstance(other, SmallInts):
            return self.decompress() == other.decompress()
        if isinstance(other, (list, tuple, np.ndarray)):
            return self.decompress() == list(other)
        return NotImplemented
