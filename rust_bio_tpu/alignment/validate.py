"""Metamorphic alignment validation: re-score an emitted path.

Port of the reference's fuzz oracle idea (fuzz/fuzz_targets/
banded_aligner.rs:10-56): independently re-derive the score of a returned
alignment from its operations and the scoring model, and compare with the
reported score. Uses the v4.0 gap model (pairwise/mod.rs:9-15):
``GapScore(k) = gap_open + gap_extend * (k - 1)`` — the first op of a gap
costs ``gap_open``, each further op ``gap_extend``.
"""

from __future__ import annotations

from rust_bio_tpu.alignment.types import Alignment, AlignmentMode
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.utils.text import to_bytes


def rescore_alignment(al: Alignment, x, y, scoring: Scoring) -> int:
    """Score implied by the alignment's path under ``scoring``."""
    x, y = to_bytes(x), to_bytes(y)
    score = 0
    if al.mode == AlignmentMode.Custom:
        if al.xstart > 0:
            score += scoring.xclip_prefix
        if al.ystart > 0:
            score += scoring.yclip_prefix
        if al.xend < al.xlen:
            score += scoring.xclip_suffix
        if al.yend < al.ylen:
            score += scoring.yclip_suffix
    last_op = None
    for i, j, op in al.path():
        name = op.kind
        if name in ("Match", "Subst"):
            score += scoring.score(x[i - 1], y[j - 1])
        elif name == "Del":
            score += (
                scoring.gap_extend if last_op == "Del" else scoring.gap_open
            )
        elif name == "Ins":
            score += (
                scoring.gap_extend if last_op == "Ins" else scoring.gap_open
            )
        last_op = name
    return score


def validate_alignment_score(al: Alignment, x, y, scoring: Scoring) -> bool:
    """True iff the reported score equals the path's re-derived score."""
    return al.score == rescore_alignment(al, x, y, scoring)
