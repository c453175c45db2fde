"""Parity + property suite for FM-index / FMD-index / device FM-index.

Golden values from reference fmindex.rs doctests and unit tests; the device
path is cross-checked against the host oracle on random texts/patterns.
"""

import numpy as np
import pytest

from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.bwt import Occ, bwt, less
from rust_bio_tpu.data_structures.fmindex import (
    BackwardSearchKind,
    FMDIndex,
    FMIndex,
)
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
from rust_bio_tpu.data_structures.suffix_array import (
    sample_suffix_array,
    suffix_array,
)


def _build(text, k=3):
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    l = less(b, alphabet)
    occ = Occ(b, k, alphabet)
    return sa, b, l, occ, FMIndex(b, l, occ)


def test_backward_search_complete():
    text = b"GCCTTAACATTATTACGCCTA$"
    sa, b, l, occ, fm = _build(text)
    res = fm.backward_search(b"TTA")
    assert res.kind == BackwardSearchKind.Complete
    assert res.interval.occ(sa) == [3, 12, 9]


def test_backward_search_partial():
    # suffix GCCTT matches partially (reference test_fmindex semantics)
    text = b"GCCTTAACATTATTACGCCTA$"
    sa, b, l, occ, fm = _build(text)
    res = fm.backward_search(b"GGGTTA")
    assert res.kind == BackwardSearchKind.Partial
    assert res.matched_len == 3


def test_backward_search_absent():
    text = b"GCCTTAACATTATTACGCCTA$"
    *_, fm = _build(text)
    # 'X' never occurs -> occ_r == 0 immediately -> Absent (issue #606 path)
    res = fm.backward_search(b"NNN")
    assert res.kind == BackwardSearchKind.Absent


def test_fmd_smems_doctest():
    text = b"ATTC$GAAT$"
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    l = less(b, alphabet)
    occ = Occ(b, 3, alphabet)
    fm = FMIndex(b, l, occ)
    fmd = FMDIndex(fm)

    intervals = fmd.smems(b"ATT", 2, 0)
    sampled = sample_suffix_array(sa, text, b, l, occ, 1)
    assert intervals[0][0].forward().occ(sampled) == [0]
    assert intervals[0][0].revcomp().occ(sampled) == [6]
    assert intervals[0][1] == 0
    assert intervals[0][2] == 3


def test_fmd_all_smems_doctest():
    text = b"ATTCGGGG$CCCCGAAT$"
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    l = less(b, alphabet)
    occ = Occ(b, 3, alphabet)
    fmd = FMDIndex(FMIndex(b, l, occ))

    intervals = fmd.all_smems(b"ATTGGGG", 0)
    assert len(intervals) == 2
    solutions = [[0, 14, 0, 3], [4, 9, 3, 4]]
    for sol, (bi, p, ln) in zip(solutions, intervals):
        fwd = bi.forward().occ(sa)
        rev = bi.revcomp().occ(sa)
        assert [fwd[0], rev[0], p, ln] == sol


def _random_text(rng, n, nl=False):
    alpha = b"ACGTN" if nl else b"ACGT"
    return rng.choice(list(alpha), size=n).astype("uint8").tobytes() + b"$"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_search_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    text = _random_text(rng, 500)
    sa, b, l, occ, fm = _build(text, k=32)
    dev = DeviceFMIndex(b, dna.n_alphabet(), sa=sa, sampling_rate=4)

    patterns = []
    for _ in range(64):
        ln = int(rng.integers(1, 20))
        if rng.random() < 0.5:
            start = int(rng.integers(0, len(text) - ln - 1))
            patterns.append(text[start : start + ln])
        else:
            patterns.append(rng.choice(list(b"ACGT"), size=ln).astype("uint8").tobytes())

    got = dev.backward_search_batch(patterns)
    for pat, res in zip(patterns, got):
        expect = fm.backward_search(pat)
        assert res.kind == expect.kind, pat
        if expect.kind != BackwardSearchKind.Absent:
            assert res.interval == expect.interval, pat
        if expect.kind == BackwardSearchKind.Partial:
            assert res.matched_len == expect.matched_len, pat


def test_device_locate_matches_sa():
    rng = np.random.default_rng(3)
    text = _random_text(rng, 400)
    sa, b, l, occ, fm = _build(text, k=32)
    dev = DeviceFMIndex(b, dna.n_alphabet(), sa=sa, sampling_rate=8)
    rows = np.arange(len(sa), dtype=np.int32)
    got = dev.locate_batch(rows)
    np.testing.assert_array_equal(got, np.asarray(sa, dtype=np.int32))


def test_device_occ_matches_host():
    rng = np.random.default_rng(4)
    text = _random_text(rng, 300)
    sa, b, l, occ, fm = _build(text, k=32)
    dev = DeviceFMIndex(b, dna.n_alphabet())
    rs = np.arange(len(b), dtype=np.int32)
    for a in b"ACGT$":
        want = np.array([occ.get(b, int(r), a) for r in rs])
        got = np.asarray(dev.occ(rs, np.full_like(rs, a)))
        np.testing.assert_array_equal(got, want)


def test_mxu_rank_matches_gather_rank():
    """The MXU one-hot-matmul rank must be bit-identical to the gather
    rank on random (r, sym) queries (both bounds, r = -1 edge)."""
    import numpy as np

    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    rng = np.random.default_rng(3)
    text = rng.choice(list(b"ACGT"), size=9000).astype(np.uint8).tobytes() + b"$"
    idx = DeviceFMIndex(bwt(text, suffix_array(text)), dna.n_alphabet())
    assert idx._mxu_swt > 0
    Q = 512
    r = rng.integers(-1, len(text), size=Q).astype(np.int32)
    sym = rng.integers(0, len(idx.symbols), size=Q).astype(np.int32)
    got = np.asarray(idx._rank_mxu(r, sym))
    want = np.asarray(idx._rank(r, sym))
    assert (got == want).all()


@pytest.mark.slow
def test_fused_search_matches_scan_path():
    """The fused Pallas search kernel (ops/fm_pallas.py) must be
    bit-identical to the XLA lax.scan path on every output, including
    Partial/Absent lanes, invalid bytes, ragged lengths and a batch that
    spans several query tiles (qtb forced small)."""
    rng = np.random.default_rng(9)
    text = _random_text(rng, 2500)
    b = bwt(text, suffix_array(text))
    dev = DeviceFMIndex(b, dna.n_alphabet())
    dev._build_fused_search(
        np.asarray(dev.bits), np.asarray(dev.ckpt), force=True
    )
    assert dev._fs_cfg is not None
    dev._fs_cfg = dict(dev._fs_cfg, qtb=128)  # force multi-tile + padding

    B, L = 300, 24
    pats = np.zeros((B, L), dtype=np.uint8)
    plens = np.zeros(B, dtype=np.int32)
    tarr = np.frombuffer(text, dtype=np.uint8)
    for i in range(B):
        ln = int(rng.integers(1, L + 1))
        plens[i] = ln
        kind = rng.random()
        if kind < 0.4:  # present substring
            s = int(rng.integers(0, len(text) - ln - 1))
            pats[i, :ln] = tarr[s : s + ln]
        elif kind < 0.8:  # random (often partial/absent)
            pats[i, :ln] = rng.choice(list(b"ACGT"), size=ln)
        else:  # contains bytes outside the alphabet
            pats[i, :ln] = rng.choice(list(b"ACGTNX"), size=ln)
    import jax.numpy as jnp

    got = dev._search_kernel(jnp.asarray(pats), jnp.asarray(plens))
    dev2 = DeviceFMIndex(b, dna.n_alphabet())
    dev2._fs_cfg = None  # XLA scan path
    want = dev2._search_kernel(jnp.asarray(pats), jnp.asarray(plens))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_index_serialization_roundtrip(tmp_path):
    from rust_bio_tpu.data_structures.serialize import load_fm_index, save_fm_index

    rng = np.random.default_rng(9)
    text = _random_text(rng, 300)
    sa, b, l, occ, fm = _build(text, k=32)
    dev = DeviceFMIndex(b, dna.n_alphabet(), sa=sa, sampling_rate=4)
    path = tmp_path / "genome.fmidx.npz"
    save_fm_index(path, dev)
    back = load_fm_index(path)

    pats = [text[10:25], text[100:140], b"ACGTACGTAC"]
    got = back.backward_search_batch(pats)
    want = dev.backward_search_batch(pats)
    for g, w in zip(got, want):
        assert g.kind == w.kind and g.interval == w.interval
    rows = np.arange(len(sa), dtype=np.int32)
    np.testing.assert_array_equal(back.locate_batch(rows), dev.locate_batch(rows))


def test_index_serialization_detects_corruption(tmp_path):
    import json
    import zipfile

    from rust_bio_tpu.data_structures.serialize import load_fm_index, save_fm_index

    rng = np.random.default_rng(10)
    text = _random_text(rng, 100)
    sa, b, l, occ, fm = _build(text, k=32)
    dev = DeviceFMIndex(b, dna.n_alphabet())
    path = tmp_path / "idx.npz"
    save_fm_index(path, dev)
    # flip bytes in one member to simulate corruption
    import numpy as _np
    with _np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    arrays["less"] = arrays["less"].copy()
    arrays["less"][65] += 1
    _np.savez_compressed(path, **arrays)
    with pytest.raises(AssertionError):
        load_fm_index(path)


# ---- batched device SMEMs vs host oracle ----

def _build_fmd_pair(seq: bytes):
    import numpy as np

    from rust_bio_tpu.alphabets import dna as _dna
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.fmd_device import DeviceFMDIndex

    text = seq + b"$" + _dna.revcomp(seq) + b"$"
    sa = suffix_array(text)
    b = bwt(text, sa)
    alphabet = dna.n_alphabet()
    fm = FMIndex(b, less(b, alphabet), Occ(b, 3, alphabet))
    fmd = FMDIndex(fm)
    alpha2 = dna.n_alphabet()
    alpha2.insert(ord("$"))
    dev = DeviceFMDIndex(DeviceFMIndex(b, alpha2, sa=sa))
    return fmd, dev


def test_device_smems_match_host():
    import numpy as np

    rng = np.random.default_rng(77)
    seq = rng.choice(list(b"ACGT"), size=500).astype("uint8").tobytes()
    fmd, dev = _build_fmd_pair(seq)

    pats, poss = [], []
    for _ in range(12):
        ln = int(rng.integers(5, 30))
        if rng.random() < 0.7:
            s = int(rng.integers(0, len(seq) - ln))
            p = bytearray(seq[s : s + ln])
            if rng.random() < 0.5:  # sprinkle a mismatch
                p[ln // 2] = int(rng.choice(list(b"ACGT")))
            p = bytes(p)
        else:
            p = rng.choice(list(b"ACGT"), size=ln).astype("uint8").tobytes()
        pats.append(p)
        poss.append(int(rng.integers(0, ln)))

    for l in (0, 5):
        got = dev.smems_batch(pats, poss, l, host_oracle=fmd)
        for b, (p, i) in enumerate(zip(pats, poss)):
            want = fmd.smems(p, i, l)
            assert got[b] == want, (b, p, i, l)


def test_device_smems_doctest_case():
    fmd, dev = _build_fmd_pair(b"ATTC")
    got = dev.smems_batch([b"ATT"], [2], 0, host_oracle=fmd)
    want = fmd.smems(b"ATT", 2, 0)
    assert got[0] == want


def test_device_all_smems_match_host():
    import numpy as np

    rng = np.random.default_rng(79)
    seq = rng.choice(list(b"ACGT"), size=400).astype("uint8").tobytes()
    fmd, dev = _build_fmd_pair(seq)
    pats = []
    for _ in range(8):
        ln = int(rng.integers(8, 40))
        s = int(rng.integers(0, len(seq) - ln))
        p = bytearray(seq[s : s + ln])
        for _ in range(int(rng.integers(0, 3))):
            p[int(rng.integers(0, ln))] = int(rng.choice(list(b"ACGT")))
        pats.append(bytes(p))
    got = dev.all_smems_batch(pats, 5, host_oracle=fmd)
    for b, p in enumerate(pats):
        assert got[b] == fmd.all_smems(p, 5), (b, p)


@pytest.mark.slow
def test_device_smems_mapper_mode_matches_default():
    """mapper_mode skips lower_rev updates in the backward phase; lower,
    size, start and match length must stay exactly the host oracle's."""
    import numpy as np

    rng = np.random.default_rng(83)
    seq = rng.choice(list(b"ACGT"), size=600).astype("uint8").tobytes()
    fmd, dev = _build_fmd_pair(seq)
    pats, poss = [], []
    for _ in range(12):
        ln = int(rng.integers(10, 60))
        s = int(rng.integers(0, len(seq) - ln))
        p = bytearray(seq[s : s + ln])
        for _ in range(int(rng.integers(0, 3))):
            p[int(rng.integers(0, ln))] = int(rng.choice(list(b"ACGT")))
        pats.append(bytes(p))
        poss.append(int(rng.integers(0, ln)))
    got = dev.smems_batch(pats, poss, 5, host_oracle=fmd, mapper_mode=True)
    for b, (p, i) in enumerate(zip(pats, poss)):
        want = fmd.smems(p, i, 5)
        assert len(got[b]) == len(want), (b, p, i)
        for (gi, gs, gl), (wi, ws, wl) in zip(got[b], want):
            assert (gi.lower, gi.size, gi.match_size) == (
                wi.lower, wi.size, wi.match_size,
            ), (b, p, i)
            assert (gs, gl) == (ws, wl), (b, p, i)


def test_kmer_lut_search_matches_exact_kernel():
    """search_batch_lut (q-mer jump + miss fallback) must be bit-identical
    to the exact scan kernel across complete/partial/absent/short lanes."""
    import numpy as np
    import jax

    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt as _bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    rng = np.random.default_rng(91)
    text = rng.choice(list(b"ACGT"), size=3000).astype(np.uint8).tobytes() + b"$"
    sa = suffix_array(text)
    idx = DeviceFMIndex(_bwt(text, sa), dna.n_alphabet())
    idx.build_kmer_lut(q=5)

    B, L = 64, 12
    tarr = np.frombuffer(text, np.uint8)
    pats = np.zeros((B, L), np.uint8)
    plens = np.zeros(B, np.int32)
    for b in range(B):
        kind = b % 4
        ln = int(rng.integers(1, L + 1)) if kind == 3 else L
        if kind == 0:  # existing substring -> complete
            s = int(rng.integers(0, len(text) - 1 - ln))
            pats[b, :ln] = tarr[s : s + ln]
        else:  # random (partial/absent mixes), some shorter than q
            pats[b, :ln] = rng.choice(list(b"ACGT"), size=ln)
        plens[b] = ln
    got = idx.search_batch_lut(pats, plens)
    want = jax.tree.map(
        np.asarray,
        idx._search_kernel(
            __import__("jax.numpy", fromlist=["asarray"]).asarray(pats),
            __import__("jax.numpy", fromlist=["asarray"]).asarray(plens),
        ),
    )
    for name, g, w in zip(("status", "lower", "upper", "mlen"), got, want):
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_u32_kernels_match_i32():
    """force_u32=True routes search/LUT/locate through the uint32 index
    arithmetic used for n >= 2^31 texts (the 3.1 Gbp human-genome
    envelope); results must be bit-identical to the int32 kernels."""
    import jax

    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex

    rng = np.random.default_rng(5)
    for trial in range(4):
        n = int(rng.integers(200, 2500))
        text = (
            rng.choice(list(b"ACGT"), size=n).astype(np.uint8).tobytes()
            + b"$"
        )
        sa = suffix_array(text)
        b = bwt(text, sa)
        i32i = DeviceFMIndex(b, dna.n_alphabet(), sa=sa, sampling_rate=8)
        u32i = DeviceFMIndex(
            b, dna.n_alphabet(), sa=sa, sampling_rate=8, force_u32=True
        )
        B, L = 48, 14
        pats = np.zeros((B, L), np.uint8)
        plens = np.zeros(B, np.int32)
        tarr = np.frombuffer(text, np.uint8)
        for i in range(B):
            ln = int(rng.integers(1, L + 1))
            if i % 3 == 0:  # random (mostly absent)
                p = rng.choice(list(b"ACGT"), size=ln).astype(np.uint8)
            else:  # real substring, sometimes mutated (partial)
                s = int(rng.integers(0, n - ln))
                p = tarr[s : s + ln].copy()
                if i % 3 == 2 and ln > 2:
                    p[int(rng.integers(0, ln))] = ord("T")
            pats[i, :ln] = p
            plens[i] = ln
        a = jax.tree.map(np.asarray, i32i._search_kernel(pats, plens))
        c = jax.tree.map(np.asarray, u32i._search_kernel(pats, plens))
        for k in range(4):
            assert (
                a[k].astype(np.int64) == c[k].astype(np.int64)
            ).all(), (trial, k)
        i32i.build_kmer_lut(q=4)
        u32i.build_kmer_lut(q=4)
        ra = i32i.search_batch_lut(pats, plens)
        rb = u32i.search_batch_lut(pats, plens)
        for k in range(4):
            assert (
                ra[k].astype(np.int64) == rb[k].astype(np.int64)
            ).all(), (trial, k)
        rows = rng.integers(0, n + 1, size=17)
        la = i32i.locate_batch(rows)
        lb = u32i.locate_batch(rows)
        assert (la.astype(np.int64) == lb.astype(np.int64)).all()
