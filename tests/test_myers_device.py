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
