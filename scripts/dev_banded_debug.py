"""Column-level diff: host banded DP vs the device banded kernel on ONE
pair.  Finds the first divergent tb column / final-state entry."""

import sys

import numpy as np
import jax.numpy as jnp

from rust_bio_tpu.alignment.pairwise import banded
from rust_bio_tpu.alignment.pairwise.banded import Band
from rust_bio_tpu.alignment.pairwise.banded_device import (
    _banded_suffix_fixups,
    _init_column_banded,
)
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.ops.sw_pallas import scan_banded_pallas_mp

from jax import lax
I32 = jnp.int32


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    # default: the first failing pair from dev_banded_check seed 0
    rng = np.random.default_rng(seed)
    from dev_banded_check import gen_pair
    pairs = [gen_pair(rng) for _ in range(24)]
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    x, y = pairs[idx]
    print(f"x({len(x)})={x!r}")
    print(f"y({len(y)})={y!r}")

    k, w = 5, 8
    sc = Scoring.from_scores(-5, -1, 2, -2)
    al = banded.Aligner(sc, k, w)
    want = al.custom(x, y)
    dbg = al._dbg
    band = al.band
    m, n = len(x), len(y)

    B = 8
    xb = np.zeros((B, m), np.uint8)
    yb = np.zeros((B, n), np.uint8)
    xb[:] = np.frombuffer(x, np.uint8)
    yb[:] = np.frombuffer(y, np.uint8)
    mlens = np.full(B, m, np.int32)
    nlens = np.full(B, n, np.int32)
    starts = np.tile(band.starts.astype(np.int32), (B, 1))
    ends = np.tile(band.ends.astype(np.int32), (B, 1))
    pen8 = np.array([-5, -1] + [sc.xclip_prefix, sc.xclip_suffix,
                                sc.yclip_prefix, sc.yclip_suffix] + [2, -2],
                    np.int32)

    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = [
        np.asarray(a) for a in scan_banded_pallas_mp(
            jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(mlens),
            jnp.asarray(nlens), jnp.asarray(pen8),
            jnp.asarray(starts), jnp.asarray(ends))
    ]

    # host tb: (m+1, n+1) int32 packed — kernel lane 0 columns 1..n
    host_tb = dbg["tb"]
    lane = 0
    first_bad = None
    for j in range(1, n + 1):
        kt = tb_cols[j - 1, :, lane].astype(np.int32) & 0xFFF
        ht = host_tb[:, j] & 0xFFF
        # host tb includes the FINAL rewrites of row 0 / col n fixups; the
        # kernel tb is pre-fixup.  Compare all rows; for row 0 and the
        # rewritten layers only i/d bits are comparable pre-fixup.
        bad = list(np.nonzero(kt[1:m] != ht[1:m])[0] + 1)
        # row m: host tb[m][j] s-bits may be XCS from accumulation;
        # kernel writes them too -> comparable except the late rewrites
        if j < n and kt[m] != ht[m]:
            bad.append(m)
        if (kt[0] & 0xFF) != (ht[0] & 0xFF):
            bad.append(0)
        if bad:
            first_bad = (j, np.array(bad[:8]))
            break
    print("first divergent tb column (rows 1..m-1):", first_bad)
    if first_bad:
        j, rows_bad = first_bad
        for i in rows_bad:
            print(f"  (i={i}, j={j}): kernel={tb_cols[j-1, i, lane]&0xFFF:03x}"
                  f" host={host_tb[i, j]&0xFFF:03x} "
                  f"band=[{band.starts[j]},{band.ends[j]})")

    # final-column state: host S[curr=n%2]
    hs = dbg["S"][n % 2]
    ks = S_f[lane]
    badS = np.nonzero(hs != ks)[0]
    print("final S mismatches at rows:", badS[:10],
          "of", m + 1)
    for i in badS[:5]:
        print(f"  S[{i}]: kernel={ks[i]} host={hs[i]} "
              f"(band_n=[{band.starts[n]},{band.ends[n]}))")
    hsn = dbg["Sn"]
    badSn = np.nonzero(hsn != Sn_f[lane])[0]
    print("Sn mismatches:", badSn[:10])
    for i in badSn[:5]:
        print(f"  Sn[{i}]: kernel={Sn_f[lane][i]} host={hsn[i]}")
    badLy = np.nonzero(dbg["Ly"] != Ly_f[lane])[0]
    print("Ly mismatches:", badLy[:10])
    hi = dbg["I"][n % 2]
    badI = np.nonzero(hi != I_f[lane])[0]
    print("final I mismatches:", badI[:10])
    for i in badI[:5]:
        print(f"  I[{i}]: kernel={I_f[lane][i]} host={hi[i]}")

    # fixups
    pens = tuple(int(v) for v in pen8[:6])
    st_n = jnp.asarray(starts)[jnp.arange(B), jnp.asarray(nlens)]
    en_n = jnp.asarray(ends)[jnp.arange(B), jnp.asarray(nlens)]
    score, tbfix_cells, Ly_fx, Lx_n, lx_set = [
        np.asarray(a) for a in _banded_suffix_fixups(
            jnp.asarray(S_f), jnp.asarray(I_f), jnp.asarray(Sn_f),
            jnp.asarray(Ly_f), jnp.asarray(tbk), B, m,
            jnp.asarray(mlens), jnp.asarray(nlens), pens, st_n, en_n)
    ]
    print(f"score: device={score[lane]} host={want.score}")
    # host post-fixup final column = host_tb[:, n]
    hfix = host_tb[:, n] & 0xFFF
    kfix = tbfix_cells[lane] & 0xFFF
    badF = np.nonzero(hfix != kfix)[0]
    print("tbfix mismatches:", badF[:10])
    for i in badF[:6]:
        print(f"  fix[{i}]: kernel={kfix[i]:03x} host={hfix[i]:03x}")
    print(f"Lx[n]: device={'set ' if lx_set[lane] else 'unset '}{Lx_n[lane]}"
          f" host={dbg['Lx'][n]}")
    print(f"host ops: {want.operations}")
    print(f"host score={want.score} start=({want.xstart},{want.ystart}) "
          f"end=({want.xend},{want.yend})")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    main()


def column_state(seed, idx, jcol):
    """Compare host column-jcol buffers vs kernel (truncate via snapshots)."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    from dev_banded_check import gen_pair
    pairs = [gen_pair(rng) for _ in range(24)]
    x, y = pairs[idx]
    k, w = 5, 8
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring
    from rust_bio_tpu.alignment.pairwise import banded
    sc = Scoring.from_scores(-5, -1, 2, -2)
    al = banded.Aligner(sc, k, w)
    al._snap = []
    al.custom(x, y)
    S, I, D, Sn = al._snap[jcol - 1]
    m = len(x)
    print(f"host col {jcol}: S[{m-1}]={S[m-1]} S[{m}]={S[m]} "
          f"I[{m}]={I[m]} D[{m}]={D[m]} Sn[{m-1}]={Sn[m-1]}")
    Sp, Ip, Dp, Snp = al._snap[jcol - 2]
    print(f"host col {jcol-1}: S[{m-1}]={Sp[m-1]} S[{m}]={Sp[m]} "
          f"D[{m}]={Dp[m]} I chain ...")
    ht = al._dbg["tb"]
    print(f"host tb({m},{jcol}) = {ht[m, jcol]&0xFFF:03x}")
    print(f"band col {jcol}: [{al.band.starts[jcol]},{al.band.ends[jcol]}) "
          f"col {jcol-1}: [{al.band.starts[jcol-1]},{al.band.ends[jcol-1]})")


if len(sys.argv) > 3 and sys.argv[3] == "col":
    sys.path.insert(0, "/root/repo/scripts")
    column_state(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[4]))
    sys.exit(0)
