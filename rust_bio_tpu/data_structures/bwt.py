"""Burrows-Wheeler transform, Occ array and less array.

Reference parity: src/data_structures/bwt.rs — ``bwt`` (:39), ``invert_bwt``
(:60), ``Occ`` checkpointed occurrence counts (:94-182), ``less`` (:186),
``bwtfind`` (:202).

TPU-native design notes: host construction is vectorized numpy; the hot
``Occ.get`` (checkpoint + byte count, the reference's SIMD ``bytecount``
loop) is a numpy ``count_nonzero`` over ≤k bytes host-side, and on device
becomes a bit-packed popcount rank (see ``fm_device.py``).
"""

from __future__ import annotations

import numpy as np

from rust_bio_tpu.alphabets import Alphabet
from rust_bio_tpu.utils.text import to_array

BWT = np.ndarray  # uint8
Less = np.ndarray  # int64, indexed by symbol
BWTFind = np.ndarray  # int64


def bwt(text, pos) -> BWT:
    """BWT of a sentinel-terminated text given its suffix array (bwt.rs:39).

    >>> from rust_bio_tpu.data_structures.suffix_array import suffix_array
    >>> t = b"GCCTTAACATTATTACGCCTA$"
    >>> bytes(bwt(t, suffix_array(t)))
    b'ATTATTCAGGACCC$CTTTCAA'
    """
    arr = to_array(text)
    pos = np.asarray(pos)
    assert len(arr) == len(pos)
    n = len(arr)
    # chunked gather: upcasting a 3.1 Gbp uint32 SA to int64 wholesale
    # costs ~50 GB of transients; 64 M-row chunks keep the peak flat
    out = np.empty(n, dtype=arr.dtype)
    step = 1 << 26
    for s in range(0, n, step):
        p = pos[s : s + step].astype(np.int64) - 1
        out[s : s + step] = arr[p]  # pos==0 wraps to text[-1] (negative ix)
    return out


def invert_bwt(bwt_arr) -> np.ndarray:
    """Original text from a BWT (single final sentinel; bwt.rs:60)."""
    b = to_array(bwt_arr)
    alphabet = Alphabet(b.tobytes())
    n = len(b)
    bf = bwtfind(b, alphabet)
    inverse = np.empty(n, dtype=np.uint8)
    r = bf[0]
    for i in range(n):
        r = bf[r]
        inverse[i] = b[r]
    return inverse


class Occ:
    """Checkpointed occurrence counts, sampled every k rows (bwt.rs:76-182).

    ``occ[ckpt, a]`` = number of occurrences of symbol ``a`` in
    ``bwt[..ckpt*k+1]`` (i.e. counts *including* the checkpoint row), exactly
    as the reference stores them.
    """

    def __init__(self, bwt_arr, k: int, alphabet: Alphabet) -> None:
        b = to_array(bwt_arr)
        n = len(b)
        self.k = int(k)
        m = alphabet.max_symbol()
        assert m is not None, "Expecting non-empty alphabet."
        m += 1
        # occ[c, a] = occurrences of a in bwt[..c*k+1].  Built as a segmented
        # bincount + cumsum over checkpoint blocks — a dense (n, m) one-hot
        # prefix sum is O(n*m) memory (87 GiB at a 100 Mbp FMD text) while
        # the checkpoints themselves are only (ceil(n/k), m).
        n_ckpts = -(-n // k) if n else 0
        idx = np.nonzero(b < m)[0]
        sym = b[idx].astype(np.int64)
        # position i first appears in checkpoint ceil(i/k); positions past
        # the last stored checkpoint row contribute nowhere
        seg = (idx + k - 1) // k
        keep = seg < n_ckpts
        flat = np.bincount(
            seg[keep] * m + sym[keep], minlength=max(n_ckpts, 1) * m
        )
        self.occ = np.cumsum(
            flat[: n_ckpts * m].reshape(n_ckpts, m), axis=0, dtype=np.int64
        )

    def get(self, bwt_arr, r: int, a: int) -> int:
        """Occurrences of ``a`` in ``bwt[..r+1]``; O(k) (bwt.rs:129-182)."""
        b = bwt_arr if isinstance(bwt_arr, np.ndarray) else to_array(bwt_arr)
        k = self.k
        lo_ck = r // k
        lo_occ = int(self.occ[lo_ck, a])
        if k > 64:
            hi_ck = lo_ck + 1
            if hi_ck < len(self.occ):
                hi_occ = int(self.occ[hi_ck, a])
                if lo_occ == hi_occ:
                    return lo_occ
                hi_idx = hi_ck * k
                if (hi_idx - r) < k // 2:
                    return hi_occ - int(
                        np.count_nonzero(b[r + 1 : hi_idx + 1] == a)
                    )
        lo_idx = lo_ck * k
        return lo_occ + int(np.count_nonzero(b[lo_idx + 1 : r + 1] == a))

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Occ):
            return NotImplemented
        return self.k == other.k and np.array_equal(self.occ, other.occ)


def less(bwt_arr, alphabet: Alphabet) -> Less:
    """#symbols lexicographically smaller than each symbol (bwt.rs:186)."""
    b = to_array(bwt_arr)
    m = alphabet.max_symbol()
    assert m is not None, "Expecting non-empty alphabet."
    counts = np.bincount(b, minlength=m + 2)[: m + 2].astype(np.int64)
    # exclusive prefix sum (the reference's prescan)
    out = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=out[1:])
    return out


def bwtfind(bwt_arr, alphabet: Alphabet) -> BWTFind:
    """LF-mapping permutation used for BWT inversion (bwt.rs:202)."""
    b = to_array(bwt_arr)
    n = len(b)
    l = less(b, alphabet)
    out = np.empty(n, dtype=np.int64)
    counters = l.copy()
    for r in range(n):
        c = b[r]
        out[counters[c]] = r
        counters[c] += 1
    return out
