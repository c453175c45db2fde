"""Weak-scaling structure table on the virtual CPU mesh (1 -> 8 devices).

One real chip is available, so wall-clock scaling is unmeasurable here;
what IS falsifiable: (a) results are bit-identical at every shard count
(shard-count invariance), (b) per-device work shrinks 1/n with ZERO
cross-device collective traffic for the data-parallel stages, and (c) the
occ-sharded FM layout's collective volume per step is known and small
relative to compute. CPU-mesh wall times are printed for structure only
(NOT device performance).

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/scaling_table.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from rust_bio_tpu import parallel
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.parallel.pipeline import (
    ShardedAligner,
    ShardedBatchAligner,
    ShardedFMIndex,
)


def main():
    assert len(jax.devices()) >= 8, "run with 8 virtual CPU devices"
    rng = np.random.default_rng(23)
    B, M, N = 1024, 150, 150
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    mlens = np.full(B, M, np.int32)
    nlens = np.full(B, N, np.int32)
    sc = Scoring.from_scores(-5, -1, 2, -2)

    # FM workload
    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    G = 200_000
    text = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes() + b"$"
    sa = suffix_array(text)
    bw = bwt(text, sa)
    Bq, L = 4096, 20
    tarr = np.frombuffer(text, np.uint8)
    qstarts = rng.integers(0, G - L - 1, size=Bq)
    qpats = [tarr[s : s + L].tobytes() for s in qstarts]

    ref_scores = None
    ref_fm = None
    rows = []
    for n in (1, 2, 4, 8):
        mesh = parallel.make_mesh(n_data=n, n_model=1,
                                  devices=jax.devices()[:n])
        al = ShardedAligner(sc, mesh)
        t0 = time.perf_counter()
        s1 = al.scores(xb, yb, mlens, nlens, "global")
        t_align = time.perf_counter() - t0
        t0 = time.perf_counter()
        s1b = al.scores(xb, yb, mlens, nlens, "global")
        t_align2 = time.perf_counter() - t0
        assert (s1 == s1b).all()
        if ref_scores is None:
            ref_scores = s1
        else:
            assert (s1 == ref_scores).all(), f"shard-variant scores at n={n}"

        fm = ShardedFMIndex(DeviceFMIndex(bw, dna.n_alphabet()), mesh)
        t0 = time.perf_counter()
        r = fm.backward_search_batch(qpats)
        t_fm = time.perf_counter() - t0
        key = [(x.kind, getattr(x, "interval", None)) for x in r]
        if ref_fm is None:
            ref_fm = key
        else:
            assert key == ref_fm, f"shard-variant FM results at n={n}"

        # structural metrics
        per_dev_cells = B * M * N // n
        per_dev_q = Bq // n
        # data-parallel stages exchange nothing device-to-device: inputs
        # shard host->device, outputs pull per shard
        comm_bytes = 0
        rows.append(
            (n, B // n, per_dev_cells, per_dev_q, comm_bytes,
             t_align2, t_fm)
        )
        print(
            f"n={n}: per-dev B={B//n} cells={per_dev_cells/1e6:.1f}M "
            f"fm-q={per_dev_q} comm=0B "
            f"(cpu-mesh walls: align {t_align2*1e3:.0f} ms, "
            f"fm {t_fm*1e3:.0f} ms — structural only)",
            flush=True,
        )

    # occ-sharded comm volume (the >HBM layout): per backward-search step
    # each query end's rank gather crosses shards with prob (1 - 1/n)
    mesh2 = parallel.make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    fm_occ = ShardedFMIndex(
        DeviceFMIndex(bw, dna.n_alphabet()), mesh2,
        index_sharding="occ_sharded",
    )
    r2 = fm_occ.backward_search_batch(qpats)
    key2 = [(x.kind, getattr(x, "interval", None)) for x in r2]
    assert key2 == ref_fm, "occ-sharded results differ"
    n_model = 4
    per_step = 2 * Bq * 8 * (1 - 1 / n_model)
    print(
        f"occ-sharded (model={n_model}): results identical; analytic "
        f"cross-shard gather volume {per_step/1024:.0f} KiB/step x {L} "
        f"steps = {per_step*L/2**20:.1f} MiB per {Bq}-query batch",
        flush=True,
    )
    print("ALL SHARD-COUNT INVARIANCE CHECKS PASSED (B=1024 / Bq=4096)")


if __name__ == "__main__":
    main()
