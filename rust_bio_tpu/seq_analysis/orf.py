"""One-way open reading frame (ORF) finder. O(n).

Reference parity: src/seq_analysis/orf.rs — ``Finder`` with configurable
start/stop codons and minimum length (:44-83), streaming 3-frame scan with
a sliding codon window (:135-182), ``Orf{start, end, offset}`` (:91).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Sequence

import numpy as np

from rust_bio_tpu.utils.text import to_bytes


@dataclass(frozen=True)
class Orf:
    start: int
    end: int
    offset: int


class Finder:
    """ORF finder.

    >>> finder = Finder([b"ATG"], [b"TGA", b"TAG", b"TAA"], 5)
    >>> list(finder.find_all(b"ACGGCTAGAAAAGGCTAGAAAA"))
    []
    """

    def __init__(
        self,
        start_codons: Sequence,
        stop_codons: Sequence,
        min_len: int,
    ) -> None:
        self.start_codons = {bytes(to_bytes(c)) for c in start_codons}
        self.stop_codons = {bytes(to_bytes(c)) for c in stop_codons}
        self.min_len = min_len

    @classmethod
    def new(cls, start_codons, stop_codons, min_len: int) -> "Finder":
        return cls(start_codons, stop_codons, min_len)

    def find_all(self, seq) -> Iterator[Orf]:
        s = to_bytes(seq)
        start_pos: List[List[int]] = [[], [], []]
        for index in range(len(s)):
            codon = s[max(index - 2, 0) : index + 1] if index >= 2 else None
            offset = (index + 1) % 3
            if codon is not None and codon in self.start_codons:
                start_pos[offset].append(index)
            if start_pos[offset] and codon is not None and codon in self.stop_codons:
                for sp in start_pos[offset]:
                    if index + 1 - sp > self.min_len:
                        yield Orf(start=sp - 2, end=index + 1, offset=offset)
                    else:
                        # if the first orf is too short, so are the others
                        break
                start_pos[offset] = []
