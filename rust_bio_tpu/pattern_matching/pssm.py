"""Position-specific scoring matrices (PSSM) for DNA and protein motifs.

Reference parity: src/pattern_matching/pssm/ — ``Motif`` trait
(mod.rs:75-302: seqs_to_weights, lookup, raw_score, score, info_content),
``ScoredPos`` (:57), ``DEF_PSEUDO``/``EPSILON``/``INVALID_MONO`` (:49-53),
``DNAMotif`` with IUPAC ``incr`` and degenerate consensus
(dnamotif.rs:31-190), ``ProtMotif`` (protmotif.rs:20-150), typed errors
(errors.rs).

TPU-native extension: ``score_batch`` computes all window scores of a
padded sequence batch as one windowed gather+sum (conv-like, vectorized).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEF_PSEUDO = 0.5
EPSILON = 1e-5
INVALID_MONO = 255


class PSSMError(ValueError):
    pass


class InvalidMonomer(PSSMError):
    def __init__(self, mono: int) -> None:
        self.mono = mono
        super().__init__(f"invalid monomer: {chr(mono) if mono < 127 else mono}")


class QueryTooShort(PSSMError):
    pass


class NullMotif(PSSMError):
    pass


class InconsistentLen(PSSMError):
    pass


class EmptyMotif(PSSMError):
    pass


class InvalidPseudos(PSSMError):
    pass


@dataclass
class ScoredPos:
    """Motif score & location of a match (mod.rs:57)."""

    loc: int = 0
    sum: float = float("-inf")
    scores: List[float] = field(default_factory=list)


class Motif:
    """Shared PSSM behavior (mod.rs:75)."""

    MONOS: bytes = b""
    MONO_CT: int = 0
    BITS: float = 0.0

    # per-class lookup table byte -> index
    LK: np.ndarray = np.full(127, INVALID_MONO, dtype=np.uint8)

    scores: np.ndarray  # (len, MONO_CT) f32
    min_score: float
    max_score: float

    # ---- construction helpers ----

    @classmethod
    def _incr(cls, mono: int) -> np.ndarray:
        raise NotImplementedError

    @classmethod
    def seqs_to_weights(
        cls, seqs: Sequence[bytes], pseudos: Optional[Sequence[float]]
    ) -> np.ndarray:
        if pseudos is not None and len(pseudos) != cls.MONO_CT:
            raise InvalidPseudos(
                f"expected {cls.MONO_CT} pseudocounts, got {len(pseudos)}"
            )
        ps = (
            np.asarray(pseudos, dtype=np.float32)
            if pseudos is not None
            else np.full(cls.MONO_CT, DEF_PSEUDO, dtype=np.float32)
        )
        if len(seqs) == 0:
            raise EmptyMotif("motif cannot be created from zero sequences")
        seqlen = len(seqs[0])
        counts = np.tile(ps, (seqlen, 1)).astype(np.float32)
        for seq in seqs:
            if len(seq) != seqlen:
                raise InconsistentLen("sequences have inconsistent lengths")
            for i, base in enumerate(bytes(seq)):
                counts[i] += cls._incr(base)
        return counts

    def _normalize(self) -> None:
        tot = self.scores.sum(axis=1, keepdims=True)
        self.scores = (self.scores / tot).astype(np.float32)

    def _calc_minmax(self) -> None:
        self.min_score = float(self.scores.min(axis=1).sum())
        self.max_score = float(self.scores.max(axis=1).sum())

    @classmethod
    def from_seqs(cls, seqs: Sequence[bytes], pseudos=None):
        m = cls.__new__(cls)
        m.scores = cls.seqs_to_weights(seqs, pseudos)
        m._normalize()
        m._calc_minmax()
        return m

    @classmethod
    def from_array(cls, scores: np.ndarray):
        m = cls.__new__(cls)
        m.scores = np.asarray(scores, dtype=np.float32)
        m._normalize()
        m._calc_minmax()
        return m

    # ---- accessors ----

    @classmethod
    def lookup(cls, mono: int) -> int:
        if mono >= 127:
            raise InvalidMonomer(mono)
        idx = int(cls.LK[mono])
        if idx == INVALID_MONO:
            raise InvalidMonomer(mono)
        return idx

    @classmethod
    def rev_lk(cls, idx: int) -> int:
        return cls.MONOS[idx] if idx < len(cls.MONOS) else INVALID_MONO

    def __len__(self) -> int:
        return self.scores.shape[0]

    def len(self) -> int:
        return len(self)

    def is_empty(self) -> bool:
        return len(self) == 0

    def get_scores(self) -> np.ndarray:
        return self.scores

    def get_min_score(self) -> float:
        return self.min_score

    def get_max_score(self) -> float:
        return self.max_score

    @classmethod
    def get_bits(cls) -> float:
        return cls.BITS

    # ---- scoring (mod.rs:195-276) ----

    def raw_score(self, seq) -> Tuple[int, float, List[float]]:
        seq = bytes(seq)
        L = len(self)
        best_start, best_score, best_m = 0, -1.0, []
        for start in range(len(seq) - L + 1):
            m = [
                float(self.scores[i, self.lookup(seq[start + i])])
                for i in range(L)
            ]
            tot = sum(m)
            if tot > best_score:
                best_score = tot
                best_start = start
                best_m = m
        return best_start, best_score, best_m

    def score(self, seq) -> ScoredPos:
        seq = bytes(seq)
        L = len(self)
        if len(seq) < L:
            raise QueryTooShort(
                f"motif len {L}, query len {len(seq)}"
            )
        if abs(self.max_score - self.min_score) < 1e-12:
            raise NullMotif("motif has no information")
        best_start, best_score, best_m = self.raw_score(seq)
        return ScoredPos(
            loc=best_start,
            sum=(best_score - self.min_score) / (self.max_score - self.min_score),
            scores=best_m,
        )

    def rel_score(self, seq) -> float:
        return self.score(seq).sum

    def info_content(self) -> float:
        """Information content (mod.rs:279-302)."""
        p = self.scores
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = np.where(p == 0.0, 0.0, -p * np.log2(np.where(p == 0, 1, p)))
        return float((self.get_bits() - ent.sum(axis=1)).sum())

    def degenerate_consensus(self) -> bytes:
        raise NotImplementedError

    # ---- batched scoring (TPU-native extension) ----

    def score_batch(self, seqs: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """(B, 2) array of (best window start, normalized score) per lane.

        Windowed gather+sum over a padded uint8 batch — vectorized
        equivalent of ``score`` (invalid monomers score -inf windows).
        """
        B, N = seqs.shape
        L = len(self)
        idx = self.LK[np.minimum(seqs, 126)]
        valid = idx != INVALID_MONO
        # score at (b, j, i) = scores[i, idx[b, j+i]]
        win = np.lib.stride_tricks.sliding_window_view(idx, L, axis=1)  # (B, W, L)
        win_valid = np.lib.stride_tricks.sliding_window_view(valid, L, axis=1)
        gathered = self.scores[np.arange(L)[None, None, :], np.minimum(win, self.MONO_CT - 1)]
        sums = np.where(win_valid.all(axis=2), gathered.sum(axis=2), -np.inf)
        # mask windows that exceed each lane's length
        W = sums.shape[1]
        ok = np.arange(W)[None, :] + L <= lens[:, None]
        sums = np.where(ok, sums, -np.inf)
        best = sums.argmax(axis=1)
        norm = (sums[np.arange(B), best] - self.min_score) / (
            self.max_score - self.min_score
        )
        return np.stack([best.astype(np.float64), norm], axis=1)


def _lk_from_monos(monos: bytes, extra=None) -> np.ndarray:
    lk = np.full(127, INVALID_MONO, dtype=np.uint8)
    for i, c in enumerate(monos):
        lk[c] = i
        lk[ord(chr(c).lower())] = i
    return lk


class DNAMotif(Motif):
    """DNA position-weight matrix (dnamotif.rs)."""

    MONOS = b"ATGC"
    MONO_CT = 4
    BITS = 2.0
    LK = _lk_from_monos(b"ATGC")

    _IUPAC = {
        ord("A"): [1.0, 0.0, 0.0, 0.0],
        ord("T"): [0.0, 1.0, 0.0, 0.0],
        ord("G"): [0.0, 0.0, 1.0, 0.0],
        ord("C"): [0.0, 0.0, 0.0, 1.0],
        ord("M"): [0.5, 0.0, 0.0, 0.5],
        ord("R"): [0.5, 0.0, 0.5, 0.0],
        ord("W"): [0.5, 0.5, 0.0, 0.0],
        ord("S"): [0.0, 0.0, 0.5, 0.5],
        ord("Y"): [0.0, 0.5, 0.0, 0.5],
        ord("K"): [0.0, 0.5, 0.5, 0.0],
        ord("V"): [0.333, 0.0, 0.333, 0.333],
        ord("H"): [0.333, 0.333, 0.0, 0.333],
        ord("D"): [0.333, 0.333, 0.333, 0.0],
        ord("B"): [0.0, 0.333, 0.333, 0.333],
        ord("N"): [0.25, 0.25, 0.25, 0.25],
        ord("0"): [0.0, 0.0, 0.0, 0.0],
    }

    @classmethod
    def _incr(cls, mono: int) -> np.ndarray:
        try:
            return np.asarray(cls._IUPAC[mono], dtype=np.float32)
        except KeyError:
            raise InvalidMonomer(mono) from None

    def degenerate_consensus(self) -> bytes:
        """IUPAC consensus (dnamotif.rs:144-190; biopython rules)."""

        def two(a: int, b: int) -> int:
            a, b = (a, b) if a < b else (b, a)
            return {
                (ord("A"), ord("C")): ord("M"),
                (ord("A"), ord("G")): ord("R"),
                (ord("A"), ord("T")): ord("W"),
                (ord("C"), ord("G")): ord("S"),
                (ord("C"), ord("T")): ord("Y"),
                (ord("G"), ord("T")): ord("K"),
            }[(a, b)]

        out = bytearray()
        for pos in range(len(self)):
            fracs = sorted(
                ((float(self.scores[pos, b]), b) for b in range(4)),
                reverse=True,
            )
            if fracs[0][0] > 0.5 and fracs[0][0] > 2.0 * fracs[1][0]:
                out.append(self.MONOS[fracs[0][1]])
            elif 4.0 * (fracs[0][0] + fracs[1][0]) > 3.0:
                out.append(two(self.MONOS[fracs[0][1]], self.MONOS[fracs[1][1]]))
            elif fracs[3][0] < EPSILON:
                base = self.MONOS[fracs[3][1]]
                out.append(
                    {ord("T"): ord("V"), ord("G"): ord("H"),
                     ord("C"): ord("D"), ord("A"): ord("B")}[base]
                )
            else:
                out.append(ord("N"))
        return bytes(out)

    def revcomp(self) -> "DNAMotif":
        """Motif of the reverse complement strand."""
        # reverse positions; complement swaps A<->T (0<->1), G<->C (2<->3)
        rc = self.scores[::-1][:, [1, 0, 3, 2]].copy()
        m = DNAMotif.__new__(DNAMotif)
        m.scores = rc
        m._calc_minmax()
        return m


class ProtMotif(Motif):
    """Protein position-weight matrix (protmotif.rs)."""

    MONOS = b"ARNDCEQGHILKMFPSTWYV"
    MONO_CT = 20
    BITS = float(np.log2(20))
    LK = _lk_from_monos(b"ARNDCEQGHILKMFPSTWYV")

    @classmethod
    def _incr(cls, mono: int) -> np.ndarray:
        if mono >= 127:
            raise InvalidMonomer(mono)
        if mono == ord("X"):
            return np.full(cls.MONO_CT, 1.0 / cls.MONO_CT, dtype=np.float32)
        idx = int(cls.LK[mono])
        if idx == INVALID_MONO:
            raise InvalidMonomer(mono)
        v = np.zeros(cls.MONO_CT, dtype=np.float32)
        v[idx] = 1.0
        return v

    def degenerate_consensus(self) -> bytes:
        out = bytearray()
        for pos in range(len(self)):
            fracs = sorted(
                ((float(self.scores[pos, b]), b) for b in range(20)),
                reverse=True,
            )
            if fracs[0][0] > 0.5 and fracs[0][0] > 2.0 * fracs[1][0]:
                out.append(self.MONOS[fracs[0][1]])
            else:
                out.append(ord("X"))
        return bytes(out)
