"""3-level wavelet matrix specialized for DNA symbol codes.

Reference parity: src/data_structures/wavelet_matrix.rs — ``DNA2INT``
3-bit code table (:20), stable-partition level construction (:44-110),
O(3) ``rank(val, p)`` (:132-155). Cross-validated against ``Occ`` exactly
as the reference's bwt.rs:252-270 test does.
"""

from __future__ import annotations

import numpy as np

from rust_bio_tpu.data_structures.rank_select import RankSelect

# 3-bit symbol codes (wavelet_matrix.rs:20-36): A (and everything else)
# -> 0, C -> 1, G -> 2, T -> 3, N -> 4, $ -> 5; ASCII digits '1'..'7' map to
# their value (pre-ranked texts); lower-case mirrors upper-case.
_DNA2INT = np.zeros(256, dtype=np.uint8)
_DNA2INT[ord("$")] = 5
for i, ch in enumerate("1234567"):
    _DNA2INT[ord(ch)] = i + 1
for cu, cl, code in (("C", "c", 1), ("G", "g", 2), ("T", "t", 3), ("N", "n", 4)):
    _DNA2INT[ord(cu)] = code
    _DNA2INT[ord(cl)] = code


class WaveletMatrix:
    HEIGHT = 3  # alphabet size <= 8 (ACGTN$)

    def __init__(self, text) -> None:
        vals = np.frombuffer(bytes(text), dtype=np.uint8)
        self.width = len(vals)
        self.zeros = []
        self.levels = []
        codes = _DNA2INT[vals]
        curr = codes
        for level in range(self.HEIGHT):
            shift = self.HEIGHT - level - 1
            bits = ((curr >> shift) & 1).astype(bool)
            self.levels.append(RankSelect(bits, 1))
            # stable partition: zeros first, then ones
            curr = np.concatenate([curr[~bits], curr[bits]])
            self.zeros.append(int(np.count_nonzero(~bits)))

    @classmethod
    def new(cls, text) -> "WaveletMatrix":
        return cls(text)

    def _prank(self, level: int, p: int, bit: int) -> int:
        if p == 0:
            return 0
        if bit == 0:
            return self.levels[level].rank_0(p - 1)
        return self.levels[level].rank_1(p - 1)

    def rank(self, val: int, p: int) -> int:
        """Occurrences of symbol ``val`` in text[..p] (inclusive); O(3)."""
        assert p < self.width, "Invalid p (it must be in range 0..wm_size-1"
        code = int(_DNA2INT[val])
        spos, epos = 0, p + 1
        for level in range(self.HEIGHT):
            shift = self.HEIGHT - level - 1
            bit = (code >> shift) & 1
            if bit:
                spos = self._prank(level, spos, 1) + self.zeros[level]
                epos = self._prank(level, epos, 1) + self.zeros[level]
            else:
                spos = self._prank(level, spos, 0)
                epos = self._prank(level, epos, 0)
        return epos - spos
