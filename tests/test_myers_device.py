"""Device Myers kernel vs host oracle (property tests)."""

import numpy as np
import pytest

from rust_bio_tpu.pattern_matching.myers import Myers
from rust_bio_tpu.pattern_matching.myers_device import BatchMyers


def _rand_seq(rng, n):
    return rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes()


@pytest.mark.parametrize("mmax", [8, 31, 32, 33, 64, 100])
def test_batch_matches_oracle(mmax):
    rng = np.random.default_rng(mmax)
    B = 16
    patterns, texts = [], []
    for _ in range(B):
        m = int(rng.integers(1, mmax + 1))
        n = int(rng.integers(1, 120))
        patterns.append(_rand_seq(rng, m))
        # half the lanes: plant a mutated copy of the pattern
        if rng.random() < 0.5 and n > m:
            t = bytearray(_rand_seq(rng, n))
            start = int(rng.integers(0, n - m))
            t[start : start + m] = patterns[-1]
            if m > 2:
                t[start + m // 2] = ord("A")
            texts.append(bytes(t))
        else:
            texts.append(_rand_seq(rng, n))

    bm = BatchMyers(patterns)
    got_d = bm.distance_batch(texts)
    got_hits = bm.find_all_end_batch(texts, 3)
    got_best = bm.find_best_end_batch(texts)

    for b in range(B):
        oracle = Myers(patterns[b])
        assert got_d[b] == oracle.distance(texts[b]), b
        assert got_hits[b] == list(oracle.find_all_end(texts[b], 3)), b
        end, dist = oracle.find_best_end(texts[b])
        assert tuple(got_best[b]) == (end, dist), b


def test_batch_bench_doctest_case():
    text = b"CGGTCCTGAGGGATTAGCAC"
    patt = b"TCCTAGGGC"
    bm = BatchMyers([patt] * 4)
    hits = bm.find_all_end_batch([text] * 4, 2)
    for h in hits:
        assert h == [(11, 2), (12, 2)]


def test_chunked_matches_host_find_all_end():
    import numpy as np

    from rust_bio_tpu.pattern_matching.myers import Myers
    from rust_bio_tpu.pattern_matching.myers_device import ChunkedMyers

    rng = np.random.default_rng(53)
    text = rng.choice(list(b"ACGT"), size=3000).astype("uint8").tobytes()
    pats = [b"GCGCGTACACACCGCCCG", text[500:515], b"ACGTACGTACGT", text[2900:2940]]
    k = 2
    dev = ChunkedMyers(pats)
    got = dev.find_all_end(text, k, chunk=64)
    for b, p in enumerate(pats):
        want = list(Myers(p).find_all_end(text, k))
        assert got[b] == want, p


def test_chunked_long_pattern_multiword():
    import numpy as np

    from rust_bio_tpu.pattern_matching.myers import Myers
    from rust_bio_tpu.pattern_matching.myers_device import ChunkedMyers

    rng = np.random.default_rng(54)
    text = rng.choice(list(b"ACGT"), size=800).astype("uint8").tobytes()
    pat = text[100:170]  # 70-mer -> 3 words
    dev = ChunkedMyers([pat])
    got = dev.find_all_end(text, 3, chunk=96)
    want = list(Myers(pat).find_all_end(text, 3))
    assert got[0] == want


def test_device_find_all_end_covers_ukkonen_unit_cost():
    """The reference's approximate-matching bench runs Myers AND Ukkonen
    on the same (pattern, k) workload; with unit cost their (end, dist)
    hits coincide, so the batched device matcher covers both
    (approximate_matching.rs:225-236)."""
    import numpy as np

    from rust_bio_tpu.pattern_matching.myers_device import ChunkedMyers
    from rust_bio_tpu.pattern_matching.ukkonen import Ukkonen, unit_cost

    rng = np.random.default_rng(17)
    text = rng.choice(list(b"ACGT"), size=800).astype("uint8").tobytes()
    pats = []
    tarr = np.frombuffer(text, np.uint8)
    for _ in range(4):
        s = int(rng.integers(0, 780))
        p = bytearray(tarr[s : s + 18].tobytes())
        p[int(rng.integers(0, 18))] = int(rng.choice(list(b"ACGT")))
        pats.append(bytes(p))
    cm = ChunkedMyers(pats)
    got = cm.find_all_end(text, 2)
    uk = Ukkonen(unit_cost)
    for b, p in enumerate(pats):
        want = list(uk.find_all_end(p, text, 2))
        assert got[b] == want, b


def test_states_traceback_matches_dp_walk():
    """The O(m+k) stored-states traceback (myers/traceback.rs mechanism)
    must produce exactly the ops of the full DP-matrix walk."""
    import numpy as np

    from rust_bio_tpu.pattern_matching.myers import Myers, Subst, Ins, Del, Match

    rng = np.random.default_rng(23)
    for trial in range(20):
        m = int(rng.integers(3, 40))
        pat = rng.choice(list(b"ACGT"), size=m).astype("uint8").tobytes()
        text = rng.choice(list(b"ACGT"), size=int(rng.integers(m, 120))
                          ).astype("uint8").tobytes()
        if rng.random() < 0.5:  # plant the pattern with errors
            s = int(rng.integers(0, len(text) - m))
            t = bytearray(text)
            t[s : s + m] = pat
            t[s + int(rng.integers(0, m))] = int(rng.choice(list(b"ACGT")))
            text = bytes(t)
        my = Myers(pat)
        dists, states = my._scan_dists(text, keep_states=True)
        for end in range(0, len(text), 7):
            # states walk
            start_s, dist_s, ops_s = my._traceback(
                text, end, (dists, states)
            )
            # reference DP-matrix walk (the previous oracle)
            D = my._dp_matrix(text[: end + 1])
            i, j = my.m, end + 1
            ops_d = []
            while i > 0:
                if j > 0 and D[i - 1, j - 1] + 1 == D[i, j]:
                    ops_d.append(Subst); i -= 1; j -= 1
                elif D[i - 1, j] + 1 == D[i, j]:
                    ops_d.append(Ins); i -= 1
                elif j > 0 and D[i, j - 1] + 1 == D[i, j]:
                    ops_d.append(Del); j -= 1
                else:
                    ops_d.append(Match); i -= 1; j -= 1
            ops_d.reverse()
            assert ops_s == ops_d, (trial, end)
            assert start_s == j
            assert dist_s == int(D[my.m, end + 1])


def test_chunked_lazy_paths_match_host_traceback():
    """ChunkedLazyMatches must recover every hit's (start, dist, ops)
    exactly as the host Myers stored-state traceback (itself golden vs
    the reference walk), including hits near chunk boundaries."""
    import numpy as np

    from rust_bio_tpu.pattern_matching.myers import Myers
    from rust_bio_tpu.pattern_matching.myers_device import ChunkedMyers

    rng = np.random.default_rng(71)
    T = 3000
    text = bytearray(rng.choice(list(b"ACGT"), size=T).astype(np.uint8))
    pats = []
    for _ in range(4):
        L = int(rng.integers(9, 34))
        p = bytes(rng.choice(list(b"ACGT")) for _ in range(L))
        pats.append(p)
        # plant several mutated copies (some at chunk boundaries)
        for pos in [120, 128 * 3 - L // 2, 777, 2048, T - L - 3]:
            cp = bytearray(p)
            for _ in range(int(rng.integers(0, 3))):
                cp[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
            text[pos : pos + L] = cp
    text = bytes(text)

    k = 2
    cm = ChunkedMyers(pats)
    lazy = cm.find_all_lazy(text, k, chunk=128)
    n_checked = 0
    for b, p in enumerate(pats):
        host = Myers(p)
        scan = host._scan_dists(text, keep_states=True)
        for end, dist in lazy.hits[b]:
            want = host._traceback(text, end, scan)
            got = lazy.path_at(b, end)
            assert got == want, (b, end)
            n_checked += 1
    assert n_checked >= 10, n_checked
