"""Suffix arrays: construction, sampling, LCP, shortest unique substrings.

Reference parity: src/data_structures/suffix_array.rs —
``suffix_array`` (:264), ``suffix_array_int`` (:304), ``lcp`` (:341),
``shortest_unique_substrings`` (:407), ``SampledSuffixArray`` (:125-184)
with the multi-sentinel ``extra_rows`` LF patch.

TPU-native design: construction is a host-side, fully vectorized
prefix-doubling sort (numpy ``lexsort``), O(n log n) with large constant-free
array passes — the induced-sorting recursion of the reference is a poor fit
for array programming, and index construction is offline/amortized. The
sentinel transform matches the reference exactly (later sentinels rank
smaller), so resulting suffix arrays are bit-identical.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from rust_bio_tpu.alphabets import Alphabet, RankTransform
from rust_bio_tpu.data_structures.smallints import SmallInts
from rust_bio_tpu.utils.text import to_array

RawSuffixArray = np.ndarray  # int64 positions
LCPArray = SmallInts


def _sentinel(text: np.ndarray) -> int:
    return int(text[-1])


def _sentinel_count(text: np.ndarray) -> int:
    s = _sentinel(text)
    assert bool(np.all(text >= s)), (
        "Expecting extra sentinel symbol being lexicographically smallest "
        "at the end of the text."
    )
    return int(np.count_nonzero(text == s))


def transform_text(text: np.ndarray, alphabet: Alphabet, sentinel_count: int) -> np.ndarray:
    """Rank-recode text; each sentinel gets a distinct descending rank.

    Mirrors reference transform_text (suffix_array.rs:444-466): the i-th
    sentinel (0-based, in text order) maps to ``sentinel_count - 1 - i`` and
    every other symbol to ``rank + sentinel_count - 1``.
    """
    s = _sentinel(text)
    transform = RankTransform(alphabet)
    offset = sentinel_count - 1
    # smallest dtype that fits: an int64 recode is 8 bytes/symbol of pure
    # waste at genome scale (the native SAIS has a u8-text fast path)
    maxv = int(transform.lut.max()) + offset
    dt = np.uint8 if maxv < 256 else (np.int32 if maxv < 2**31 else np.int64)
    ranks = (transform.lut.astype(np.int64) + offset).astype(dt)
    out = ranks[text]
    # descending ranks: first sentinel -> count-1, ..., last -> 0.
    # flatnonzero (one pass, tiny result) instead of a full cumsum — the
    # (n,) int64 cumsum intermediate is 25 GB at a 3 Gbp text
    sent_pos = np.flatnonzero(text == s)
    out[sent_pos] = (
        sentinel_count - 1 - np.arange(sentinel_count, dtype=np.int64)
    ).astype(out.dtype)
    return out


def _sa_prefix_doubling(rank0: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling with numpy lexsort. O(n log n)."""
    n = len(rank0)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    _, rank = np.unique(rank0, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        changed = np.ones(n, dtype=bool)
        changed[1:] = (rank[order[1:]] != rank[order[:-1]]) | (
            key2[order[1:]] != key2[order[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def suffix_array(text) -> RawSuffixArray:
    """Suffix array of a sentinel-terminated text (multi-sentinel allowed).

    Construction uses the native O(n) SAIS kernel (native/biotpu.cpp) when
    available, falling back to the numpy prefix-doubling sort. Both paths
    produce identical arrays (property-tested).

    Reference: suffix_array.rs:264-289. Example:

    >>> list(suffix_array(b"GCCTTAACATTATTACGCCTA$"))[:5]
    [21, 20, 5, 6, 14]
    """
    arr = to_array(text)
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    alphabet = Alphabet(arr.tobytes())
    sc = _sentinel_count(arr)
    transformed = transform_text(arr, alphabet, sc)
    from rust_bio_tpu import native

    sa = native.sais(transformed, int(transformed.max()) + 1)
    if sa is not None:
        return sa
    return _sa_prefix_doubling(transformed)


def suffix_array_int(text: Sequence[int]) -> RawSuffixArray:
    """Suffix array for an integer-alphabet text (reference :304)."""
    arr = np.asarray(text, dtype=np.int64)
    return _sa_prefix_doubling(arr)


def lcp(text, pos: RawSuffixArray) -> LCPArray:
    """Compressed LCP array via Kasai's algorithm (reference :341-365).

    Entry 0 and entry n are -1 (as in the reference's SmallInts default).
    """
    arr = to_array(text)
    n = len(arr)
    assert n == len(pos)
    rank = np.empty(n, dtype=np.int64)
    rank[np.asarray(pos, dtype=np.int64)] = np.arange(n)

    out = SmallInts.from_elem(-1, n + 1)
    l = 0
    pos = np.asarray(pos, dtype=np.int64)
    for p in range(n - 1):
        r = rank[p]
        pred = pos[r - 1]
        while pred + l < n and p + l < n and arr[p + l] == arr[pred + l]:
            l += 1
        out.set(int(r), l)
        l = l - 1 if l > 0 else 0
    return out


def shortest_unique_substrings(
    pos: Union[RawSuffixArray, "SampledSuffixArray"], lcp_arr: LCPArray
) -> List[Optional[int]]:
    """Per-position length of the shortest unique substring (reference :407)."""
    n = len(pos)
    sus: List[Optional[int]] = [None] * n

    def get(i: int) -> int:
        if isinstance(pos, np.ndarray):
            return int(pos[i])
        return pos.get(i)  # type: ignore[union-attr]

    for i in range(n):
        nxt = lcp_arr.get(i + 1)
        if nxt is None:
            nxt = 0
        length = 1 + max(lcp_arr.get(i), nxt)
        p = get(i)
        if n - p >= length:
            sus[p] = length
    return sus


class SampledSuffixArray:
    """Sampled SA with LF-walk lookup (reference :125-184).

    Multi-sentinel texts additionally persist ``extra_rows``: positions whose
    BWT symbol is the sentinel, where LF-mapping is inaccurate.
    """

    def __init__(self, bwt, less, occ, sample, s, extra_rows, sentinel):
        self.bwt = bwt
        self.less = less
        self.occ = occ
        self.sample = sample
        self.s = s
        self.extra_rows = extra_rows
        self.sentinel = sentinel

    def __len__(self) -> int:
        return len(self.bwt)

    def sampling_rate(self) -> int:
        return self.s

    def get(self, index: int) -> Optional[int]:
        if index >= len(self):
            return None
        pos = index
        offset = 0
        while True:
            if pos % self.s == 0:
                return int(self.sample[pos // self.s]) + offset
            c = int(self.bwt[pos])
            if c == self.sentinel:
                return self.extra_rows[pos] + offset
            pos = int(self.less[c]) + self.occ.get(self.bwt, pos - 1, c)
            offset += 1


def sample_suffix_array(
    sa: RawSuffixArray, text, bwt, less, occ, sampling_rate: int
) -> SampledSuffixArray:
    """Sample a raw SA for O(s) FM-index locate (reference :86-120)."""
    arr = to_array(text)
    sentinel = _sentinel(arr)
    sample = []
    extra_rows = {}
    for i in range(len(sa)):
        idx = int(sa[i])
        if i % sampling_rate == 0:
            sample.append(idx)
        elif int(bwt[i]) == sentinel:
            extra_rows[i] = idx
    return SampledSuffixArray(
        bwt=bwt,
        less=less,
        occ=occ,
        sample=np.asarray(sample, dtype=np.int64),
        s=sampling_rate,
        extra_rows=extra_rows,
        sentinel=sentinel,
    )
