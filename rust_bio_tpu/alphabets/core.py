"""Alphabet and RankTransform (reference parity: src/alphabets/mod.rs).

The reference stores symbols in a bit-set and ranks in a VecMap; here both
are numpy LUTs so the same objects feed host code and device gathers.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List

import numpy as np

from rust_bio_tpu.utils.text import TextLike, to_array, to_bytes


class Alphabet:
    """A set of u8 symbols (reference: alphabets::Alphabet, mod.rs:30)."""

    def __init__(self, symbols: TextLike = b"") -> None:
        self._mask = np.zeros(256, dtype=bool)
        b = to_bytes(symbols)
        if len(b) > 4096:
            # one vectorized pass — the byte-wise Python loop costs
            # ~minutes on a Gbp-scale genome text
            self._mask |= (
                np.bincount(np.frombuffer(b, np.uint8), minlength=256) > 0
            )
        else:
            for s in b:
                self._mask[s] = True

    @classmethod
    def new(cls, symbols: TextLike) -> "Alphabet":
        return cls(symbols)

    def insert(self, a: int) -> None:
        self._mask[a] = True

    def is_word(self, text: TextLike) -> bool:
        arr = to_array(text)
        return bool(self._mask[arr].all())

    def max_symbol(self) -> int | None:
        idx = np.nonzero(self._mask)[0]
        return int(idx[-1]) if idx.size else None

    def __len__(self) -> int:
        return int(self._mask.sum())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Alphabet) and bool(
            (self._mask == other._mask).all()
        )

    def __contains__(self, a: int) -> bool:
        return bool(self._mask[a])

    def is_empty(self) -> bool:
        return not self._mask.any()

    def symbols(self) -> List[int]:
        """Sorted list of member symbols."""
        return [int(s) for s in np.nonzero(self._mask)[0]]

    def __iter__(self) -> Iterator[int]:
        return iter(self.symbols())

    def intersection(self, other: "Alphabet") -> "Alphabet":
        out = Alphabet()
        out._mask = self._mask & other._mask
        return out

    def difference(self, other: "Alphabet") -> "Alphabet":
        out = Alphabet()
        out._mask = self._mask & ~other._mask
        return out

    def union(self, other: "Alphabet") -> "Alphabet":
        out = Alphabet()
        out._mask = self._mask | other._mask
        return out

    def mask(self) -> np.ndarray:
        """(256,) bool membership LUT for vectorized validation."""
        return self._mask.copy()


class RankTransform:
    """Dense rank recoding of an alphabet (reference: mod.rs:220).

    Symbols get ranks 0..len-1 in ascending symbol order. ``lut`` is a
    (256,) uint8 table (255 = invalid) — the device-side transform is a
    single gather.
    """

    INVALID = 255

    def __init__(self, alphabet: Alphabet) -> None:
        self.lut = np.full(256, self.INVALID, dtype=np.uint8)
        syms = alphabet.symbols()
        for r, c in enumerate(syms):
            self.lut[c] = r
        self._len = len(syms)

    @classmethod
    def new(cls, alphabet: Alphabet) -> "RankTransform":
        return cls(alphabet)

    def __len__(self) -> int:
        return self._len

    def get(self, a: int) -> int:
        r = self.lut[a]
        if r == self.INVALID:
            raise KeyError(f"Unexpected character: {a!r}")
        return int(r)

    def transform(self, text: TextLike) -> np.ndarray:
        arr = to_array(text)
        out = self.lut[arr]
        if (out == self.INVALID).any():
            bad = arr[out == self.INVALID][0]
            raise KeyError(f"Unexpected character in text: {bad!r}")
        return out

    def get_width(self) -> int:
        """Bits needed to encode the largest rank (reference: mod.rs:430)."""
        return int(np.ceil(np.log2(self._len))) if self._len > 1 else 0

    def _bits(self) -> int:
        return int(np.ceil(np.log2(self._len))) if self._len > 1 else 0

    def qgrams(self, q: int, text: TextLike) -> np.ndarray:
        """All q-gram codes of ``text``, packed ``bits``-per-rank, new symbol
        in the low bits (reference: mod.rs:314). Vectorized.
        """
        assert q > 0, "Expecting q-gram length q to be larger than 0."
        bits = self._bits()
        assert bits * q <= 64, "Expecting q to be smaller than usize / log2(|A|)"
        ranks = self.transform(text).astype(np.uint64)
        n = len(ranks)
        if n < q:
            return np.zeros(0, dtype=np.uint64)
        shifts = np.arange(q - 1, -1, -1, dtype=np.uint64) * np.uint64(bits)
        # windows[i, k] = rank[i + k]
        windows = np.lib.stride_tricks.sliding_window_view(ranks, q)
        return (windows << shifts).sum(axis=1, dtype=np.uint64) & np.uint64(
            (1 << (bits * q)) - 1 if bits * q < 64 else (2**64 - 1)
        )

    def rev_qgrams(self, q: int, text: TextLike) -> np.ndarray:
        """q-gram codes in reverse text order (reference: mod.rs:360)."""
        return self.qgrams(q, text)[::-1].copy()

    def alphabet(self) -> Alphabet:
        out = Alphabet()
        out._mask = self.lut != self.INVALID
        return out


def english_alphabet() -> Alphabet:
    """The lowercase English alphabet (reference: alphabets::english)."""
    return Alphabet(bytes(range(ord("a"), ord("z") + 1)))
