"""Rank/select bitvector.

Reference parity: src/data_structures/rank_select.rs — superblock-sampled
rank/select (Gonzalez et al. 2005), incremental ``push``/``extend``,
inclusive ``rank_1(i)``/``rank_0(i)`` (None out of range), 1-based
``select_1(j)``/``select_0(j)``.

TPU-native take: the bitvector is a numpy array with a lazily rebuilt
cumulative-count table — rank is one gather, select one ``searchsorted``
(vectorized batch variants included). The reference's ``k`` sampling factor
is kept for API parity but space/time follow the array layout.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np


class RankSelect:
    def __init__(self, bits, k: int = 1) -> None:
        """``bits``: bool array / list of bool / packed uint8 little-endian."""
        if isinstance(bits, np.ndarray) and bits.dtype == np.uint8:
            bits = np.unpackbits(bits, bitorder="little").astype(bool)
        self._bits = np.asarray(bits, dtype=bool).copy()
        self._k = int(k)
        self._cum: Optional[np.ndarray] = None

    @classmethod
    def new(cls, bits, k: int = 1) -> "RankSelect":
        return cls(bits, k)

    # ---- incremental growth (rank_select.rs:96-180) ----
    def push(self, bit: bool) -> None:
        self._bits = np.append(self._bits, bool(bit))
        self._cum = None

    def extend(self, bits: Iterable[bool]) -> None:
        self._bits = np.concatenate([self._bits, np.fromiter(bits, dtype=bool)])
        self._cum = None

    # ---- accessors ----
    def k(self) -> int:
        return self._k

    def bits(self) -> np.ndarray:
        return self._bits

    def __len__(self) -> int:
        return len(self._bits)

    def get(self, i: int) -> bool:
        return bool(self._bits[i])

    def _cumsum(self) -> np.ndarray:
        if self._cum is None:
            self._cum = np.cumsum(self._bits, dtype=np.int64)
        return self._cum

    # ---- rank/select ----
    def rank_1(self, i: int) -> Optional[int]:
        if i >= len(self._bits) or i < 0:
            return None
        return int(self._cumsum()[i])

    def rank_0(self, i: int) -> Optional[int]:
        r = self.rank_1(i)
        return None if r is None else (i + 1) - r

    def rank(self, i: int) -> Optional[int]:
        return self.rank_1(i)

    def select_1(self, j: int) -> Optional[int]:
        if j == 0:
            return None
        cum = self._cumsum()
        if len(cum) == 0 or j > cum[-1]:
            return None
        return int(np.searchsorted(cum, j, side="left"))

    def select_0(self, j: int) -> Optional[int]:
        if j == 0:
            return None
        cum0 = np.arange(1, len(self._bits) + 1) - self._cumsum()
        if len(cum0) == 0 or j > cum0[-1]:
            return None
        return int(np.searchsorted(cum0, j, side="left"))

    def select(self, j: int) -> Optional[int]:
        return self.select_1(j)

    # ---- batched variants (device-friendly) ----
    def rank_1_batch(self, idx: Sequence[int]) -> np.ndarray:
        return self._cumsum()[np.asarray(idx, dtype=np.int64)]

    def select_1_batch(self, js: Sequence[int]) -> np.ndarray:
        cum = self._cumsum()
        return np.searchsorted(cum, np.asarray(js, dtype=np.int64), side="left")
