"""Alignment result types (reference parity: bio_types::alignment, re-exported
at src/alignment/mod.rs:14).

``Alignment`` mirrors the reference struct: score, x/y start/end, lengths,
operation list and mode. Operations are lightweight named tuples so tests can
compare op sequences exactly like the reference's unit tests do.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, NamedTuple, Tuple


class AlignmentMode(Enum):
    Local = "local"
    Semiglobal = "semiglobal"
    Global = "global"
    Custom = "custom"


class AlignmentOperation(NamedTuple):
    kind: str  # Match | Subst | Del | Ins | Xclip | Yclip
    len: int = 0

    def __repr__(self) -> str:  # match rust Debug-ish display
        if self.kind in ("Xclip", "Yclip"):
            return f"{self.kind}({self.len})"
        return self.kind


Match = AlignmentOperation("Match")
Subst = AlignmentOperation("Subst")
Del = AlignmentOperation("Del")
Ins = AlignmentOperation("Ins")


def Xclip(n: int) -> AlignmentOperation:
    return AlignmentOperation("Xclip", n)


def Yclip(n: int) -> AlignmentOperation:
    return AlignmentOperation("Yclip", n)


_CIGAR_CHAR = {"Match": "=", "Subst": "X", "Del": "D", "Ins": "I"}


@dataclass
class Alignment:
    """Pairwise alignment of x (query) against y (reference).

    Field semantics identical to bio_types::alignment::Alignment:
    - score: alignment score
    - xstart/xend, ystart/yend: 0-based half-open aligned spans
    - xlen/ylen: full sequence lengths
    - operations: op list (including clips in Custom mode)
    - mode: which boundary condition produced this alignment
    """

    score: int
    xstart: int = 0
    xend: int = 0
    ystart: int = 0
    yend: int = 0
    xlen: int = 0
    ylen: int = 0
    operations: List[AlignmentOperation] = field(default_factory=list)
    mode: AlignmentMode = AlignmentMode.Custom

    def filter_clip_operations(self) -> None:
        """Drop Xclip/Yclip ops (reference: Alignment::filter_clip_operations)."""
        self.operations = [
            op
            for op in self.operations
            if op.kind in ("Match", "Subst", "Ins", "Del")
        ]

    def cigar(self, hard_clip: bool = False) -> str:
        """CIGAR string, x as the query (reference: Alignment::cigar).

        Clipped query prefix/suffix rendered as S (or H when ``hard_clip``).
        Match -> '=', Subst -> 'X', Ins -> 'I', Del -> 'D'.
        """
        if self.mode in (AlignmentMode.Global, AlignmentMode.Local):
            raise ValueError(
                f"Cigar fn not supported for {self.mode.name} Alignment mode"
            )
        clip_str = "H" if hard_clip else "S"
        out: List[str] = []
        if self.xstart > 0:
            out.append(f"{self.xstart}{clip_str}")
        # itertools.groupby runs the run-length merge in C — the mapper
        # emits millions of ops/s through here (clips filtered FIRST, as
        # the reference does: runs merge across removed clip ops)
        from itertools import groupby

        ops = [op for op in self.operations if op.kind in _CIGAR_CHAR]
        for op, grp in groupby(ops):
            out.append(f"{sum(1 for _ in grp)}{_CIGAR_CHAR[op.kind]}")
        if self.xlen > self.xend:
            out.append(f"{self.xlen - self.xend}{clip_str}")
        return "".join(out)

    def path(self) -> List[Tuple[int, int, AlignmentOperation]]:
        """Matrix-path coordinates per op (reference: Alignment::path)."""
        path: List[Tuple[int, int, AlignmentOperation]] = []
        x_i, y_i = self.xstart, self.ystart
        for op in self.operations:
            if op.kind == "Match" or op.kind == "Subst":
                x_i += 1
                y_i += 1
                path.append((x_i, y_i, op))
            elif op.kind == "Ins":
                x_i += 1
                path.append((x_i, y_i, op))
            elif op.kind == "Del":
                y_i += 1
                path.append((x_i, y_i, op))
        return path

    def pretty(self, x: bytes, y: bytes, ncol: int = 80) -> str:
        """Three-row visualization of the alignment."""
        x = bytes(x)
        y = bytes(y)
        x_pretty, inb, y_pretty = [], [], []

        def push(cx: str, ci: str, cy: str) -> None:
            x_pretty.append(cx)
            inb.append(ci)
            y_pretty.append(cy)

        x_i, y_i = self.xstart, self.ystart
        # leading unaligned context
        for k in range(self.xstart):
            push(chr(x[k]), " ", " ")
        for k in range(self.ystart):
            push(" ", " ", chr(y[k]))
        for op in self.operations:
            if op.kind in ("Match", "Subst"):
                push(
                    chr(x[x_i]),
                    "|" if op.kind == "Match" else "\\",
                    chr(y[y_i]),
                )
                x_i += 1
                y_i += 1
            elif op.kind == "Ins":
                push(chr(x[x_i]), "+", "-")
                x_i += 1
            elif op.kind == "Del":
                push("-", "x", chr(y[y_i]))
                y_i += 1
        for k in range(self.xend, self.xlen):
            push(chr(x[k]), " ", " ")
        for k in range(self.yend, self.ylen):
            push(" ", " ", chr(y[k]))

        lines = []
        for s in range(0, len(x_pretty), ncol):
            lines.append("".join(x_pretty[s : s + ncol]))
            lines.append("".join(inb[s : s + ncol]))
            lines.append("".join(y_pretty[s : s + ncol]))
            lines.append("")
        return "\n".join(lines)

    # aliases matching reference naming
    def y_aln_len(self) -> int:
        return self.yend - self.ystart

    def x_aln_len(self) -> int:
        return self.xend - self.xstart
