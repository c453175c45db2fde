"""Consensus from noisy reads via POA + batched rescoring.

Usage: python examples/consensus_poa.py
"""

import numpy as np

from rust_bio_tpu.alignment.poa import Aligner
from rust_bio_tpu.alignment.poa_batch import BatchPoa
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

rng = np.random.default_rng(0)
truth = bytes(rng.choice(list(b"ACGT")) for _ in range(60))
reads = []
for _ in range(8):
    r = bytearray(truth)
    for _ in range(2):
        r[int(rng.integers(0, len(r)))] = int(rng.choice(list(b"ACGT")))
    reads.append(bytes(r))

sc = Scoring.from_scores(-4, -4, 3, -2)
al = Aligner(sc, reads[0])
for r in reads[1:]:
    al.global_(r).add_to_graph()
cons = al.consensus()
print("truth    :", truth.decode())
print("consensus:", bytes(cons).decode())

# batched rescoring of all reads against the final graph (device kernel)
bp = BatchPoa(sc, al)
scores = bp.global_scores(reads)
print("read scores vs graph:", scores.tolist())

# full alignments (device forward + traceback, op lists oracle-identical):
# usable to extend the graph exactly like host alignments
alns = bp.global_alignments(reads[:2])
print("first read ops:", alns[0].operations[:6], "...")


if __name__ == "__main__":
    pass
