"""HBM-resident FM-index with batched backward search (the TPU-native Occ).

Redesign of the reference's FM-index hot loop (fmindex.rs:144-208 calling
bwt.rs:129-182): instead of a checkpoint + SIMD byte-count scan per query
symbol, the BWT is stored as per-symbol bit-planes packed into uint32 words
with per-word exclusive checkpoint counts. A rank query is then

    rank(r, a) = ckpt[a, r >> 5] + popcount(bits[a, r >> 5] & mask(r & 31))

— one gather + one popcount per query, fully batched over the read batch in
vector lanes. Search over a pattern batch is a single ``lax.scan`` over
pattern positions (all lanes advance in lockstep, finished lanes masked),
and locate is a batched LF-walk of ≤ s steps.

Memory: sigma * n/8 bytes of bit-planes + sigma * n/8 bytes of checkpoints —
for DNA+sentinel over a 3 Gbp genome ≈ 4.5 GB, HBM-resident on one chip.

Results are bit-identical to the host oracle ``fmindex.FMIndex`` (including
the occ_r == 0 underflow guard and Partial/Absent semantics), which is
property-tested in tests/test_fmindex.py.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.alphabets import Alphabet
from rust_bio_tpu.data_structures.fmindex import (
    BackwardSearchResult,
    Interval,
)
from rust_bio_tpu.utils.text import to_array

I32 = jnp.int32
U32 = jnp.uint32
_UMAX = np.uint32(0xFFFFFFFF)  # the u32 kernels' "-1" sentinel

# status codes in the kernel's result
ABSENT, PARTIAL, COMPLETE = 0, 1, 2


def _pack_bitplanes(b: np.ndarray, symbols: List[int]):
    """(sigma, nw) uint32 bit-planes + (sigma, nw) int32 exclusive counts.

    Vectorized word packing: a (nw, 32) boolean view dotted with bit
    weights (`np.bitwise_or.at` is ~50x slower at genome scale)."""
    n = len(b)
    nw = (n + 31) // 32 or 1
    bits = np.zeros((len(symbols), nw), dtype=np.uint32)
    ckpt = np.zeros((len(symbols), nw), dtype=np.int32)
    pad = nw * 32 - n
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
    for si, sym in enumerate(symbols):
        is_sym = np.pad((b == sym), (0, pad)).reshape(nw, 32)
        bits[si] = (is_sym * weights[None, :]).sum(axis=1, dtype=np.uint32)
        counts = is_sym.sum(axis=1, dtype=np.int64)
        ckpt[si, 1:] = np.cumsum(counts[:-1])
    return bits, ckpt


class DeviceFMIndex:
    """Packed FM-index resident in device HBM, with batched search/locate."""

    def __init__(
        self,
        bwt_arr,
        alphabet: Alphabet,
        sa=None,
        sampling_rate: int = 32,
        force_u32: bool = False,
    ):
        b = to_array(bwt_arr)
        self.n = len(b)
        # texts with n >= 2^31 (the full human genome) carry suffix
        # positions / interval bounds that no longer fit int32: the
        # search/locate kernels switch to uint32 index arithmetic (native
        # speed on the TPU's 32-bit datapath; 0xFFFFFFFF takes the role
        # of the signed path's -1 sentinel).  ``force_u32`` lets tests
        # property-check the u32 kernels on small texts.
        assert self.n < 2**32 - 1, "single-chip index caps at n < 2^32-1"
        self._big = bool(force_u32) or self.n >= 2**31
        symbols = sorted(set(alphabet.symbols()) | set(np.unique(b).tolist()))
        self.symbols = symbols
        sym_of = np.full(256, -1, dtype=np.int32)
        for si, sym in enumerate(symbols):
            sym_of[sym] = si
        bits, ckpt = _pack_bitplanes(b, symbols)

        counts = np.bincount(b, minlength=257).astype(np.int64)
        less = np.zeros(257, dtype=np.int64)
        np.cumsum(counts[:-1], out=less[1:])

        packed = np.stack([bits.view(np.int32), ckpt], axis=-1)
        self._fused = jnp.asarray(packed)
        # bits/ckpt stay HOST-side: every consumer (sharding, save,
        # row-layout build) starts from np.asarray(...), and device
        # copies would duplicate the fused table's HBM (1.25 GB at a
        # 1 Gbp text).  parallel/pipeline.py re-device_puts on shard.
        self.bits = bits
        self.ckpt = ckpt
        # MXU rank path: one-hot-matmul table scan (byte-plane table is
        # exact in bf16; one-hot rows select a single product, so the dot
        # is bit-exact).  The per-query random gather scalarizes on TPU
        # (~35 ns/element); for small references a dense (Q, S*Wt) @
        # (S*Wt, 896) matmul on the MXU retrieves the checkpoint bytes and
        # bit-plane bytes for every query at once.
        self._mxu_swt = 0
        self._fs_cfg = None
        nw = bits.shape[1]
        n_present = int(np.count_nonzero(bits.any(axis=1)))
        swt = (n_present + 1) * (-(-nw // 128))
        if swt <= 2048 and self.n < (1 << 23) and not self._big:
            self._build_mxu_tables(bits, ckpt)
        if not self._big:
            self._build_fused_search(bits, ckpt)
        inp = np.uint32 if self._big else np.int32
        self.less = jnp.asarray(less.astype(inp))
        self.sym_of = jnp.asarray(sym_of)
        # (n,) symbol indices; uint8 storage (S <= 256 always) — int32
        # costs 4 GB of HBM at a 1 Gbp text.  Both byte arrays stay
        # HOST-side until a device consumer touches them (search never
        # does; only locate needs bwt_sym): at a 2 Gbp text an eager
        # upload costs 4 GB of HBM plus ~60 s through the axon tunnel.
        self._bwt_sym = sym_of[b].astype(np.uint8)
        # less re-keyed by symbol rank (tiny; replaces a byte-table gather
        # in the locate walk)
        self.less_sym = jnp.asarray(
            less[np.asarray(symbols, np.int64)].astype(inp)
        )
        self._bwt_bytes = b
        # lexicographically smallest symbol == the sentinel (by construction
        # the text's final sentinel is the smallest; suffix_array.rs:431-441)
        self.sentinel = int(b.min()) if self.n else 0

        # sampled SA for locate: sa[i] kept if i%s==0; sentinel-BWT rows
        # additionally store their exact SA values (the reference's
        # extra_rows patch, suffix_array.rs:166-175) so multi-sentinel
        # texts (e.g. the FMD-index T$revcomp(T)$ layout) locate correctly
        self.s = int(sampling_rate)
        if sa is not None:
            sa = np.asarray(sa)
            self.sa_sample = jnp.asarray(sa[:: self.s].astype(inp))
            sent_rows = np.nonzero(b == (b.min() if self.n else 0))[0]
            self.sent_rows = jnp.asarray(sent_rows.astype(inp))
            self.sent_vals = jnp.asarray(sa[sent_rows].astype(inp))
        else:
            self.sa_sample = None

    # ------------------------------------------------------------------
    # lazy device views of the BWT byte arrays (search never reads them;
    # locate walks bwt_sym): host numpy until first device access
    @property
    def bwt_bytes(self):
        if isinstance(self._bwt_bytes, np.ndarray):
            self._bwt_bytes = jnp.asarray(self._bwt_bytes)
        return self._bwt_bytes

    @bwt_bytes.setter
    def bwt_bytes(self, v):
        self._bwt_bytes = v

    @property
    def bwt_sym(self):
        if isinstance(self._bwt_sym, np.ndarray):
            self._bwt_sym = jnp.asarray(self._bwt_sym)
        return self._bwt_sym

    @bwt_sym.setter
    def bwt_sym(self, v):
        self._bwt_sym = v

    def bwt_host(self) -> np.ndarray:
        """BWT bytes as host numpy WITHOUT forcing a device upload (and
        without a device->host pull if already uploaded)."""
        v = self._bwt_bytes
        return v if isinstance(v, np.ndarray) else np.asarray(v)

    # ------------------------------------------------------------------
    def _refresh_fused(self, device_put_sharding=None):
        """(Re)build the fused (S, nwords, 2) bits|ckpt array the rank
        gather reads — one gather fetches both the packed word and its
        checkpoint count. Call after replacing bits/ckpt (sharding,
        deserialization).

        Packing happens in numpy when possible: eager jnp ops here would
        remote-compile shape-specific kernels per genome (minutes through
        the axon tunnel); a plain device transfer does not compile."""
        packed = np.stack(
            [np.asarray(self.bits).view(np.int32), np.asarray(self.ckpt)],
            axis=-1,
        )
        if device_put_sharding is None:
            self._fused = jnp.asarray(packed)
        else:
            self._fused = jax.device_put(jnp.asarray(packed), device_put_sharding)
        # (re)decide the MXU-rank path from the rebuilt tables (objects may
        # arrive here from deserialization without going through __init__)
        self._mxu_swt = 0
        self._fs_cfg = None
        if not hasattr(self, "_big"):
            self._big = self.n >= 2**31
        if device_put_sharding is None and not self._big:
            # sharded occ keeps the gather path
            bits = np.asarray(self.bits)
            n_present = int(np.count_nonzero(bits.any(axis=1)))
            swt = (n_present + 1) * (-(-bits.shape[1] // 128))
            if swt <= 2048 and self.n < (1 << 23):
                self._build_mxu_tables(bits, np.asarray(self.ckpt))
            self._build_fused_search(bits, np.asarray(self.ckpt))

    def _build_mxu_tables(self, bits: np.ndarray, ckpt: np.ndarray) -> None:
        """(Se*Wt, 7*128) bf16 byte-plane table: per word, the 3 checkpoint
        bytes (n < 2^24) and the 4 bit-plane bytes.  Byte values are exact
        in bf16, and one-hot rows select a single product, so the MXU
        matmul is bit-exact at full bf16 throughput (no f32 passes).

        Symbols absent from the text (their bit-plane is all zero — common
        with the ambiguity alphabets, e.g. lowercase/N over an ACGT genome)
        all share a single zero block-row, so Se = present + 1 and larger
        references stay under the table-width cap."""
        S, nw = bits.shape
        present = bits.any(axis=1)
        order = np.nonzero(present)[0]
        Se = len(order) + 1  # + shared zero row for absent symbols
        bits = np.concatenate([bits[order], np.zeros((1, nw), bits.dtype)])
        ckpt = np.concatenate([ckpt[order], np.zeros((1, nw), ckpt.dtype)])
        Wt = -(-nw // 128)
        pad = Wt * 128 - nw
        bp = np.pad(bits, ((0, 0), (0, pad)))
        cp = np.pad(ckpt.astype(np.uint32), ((0, 0), (0, pad)))
        self._mxu_swt = Se * Wt
        self._mxu_wt = Wt
        base = np.full(S, (Se - 1) * Wt, np.int32)  # absent -> zero row
        base[order] = np.arange(len(order), dtype=np.int32) * Wt
        self._mxu_base = jnp.asarray(base)  # (S,) row base per symbol index
        planes = [
            (cp >> 0) & 0xFF,
            (cp >> 8) & 0xFF,
            (cp >> 16) & 0xFF,
            (bp >> 0) & 0xFF,
            (bp >> 8) & 0xFF,
            (bp >> 16) & 0xFF,
            (bp >> 24) & 0xFF,
        ]
        self._mxu_T = jnp.asarray(
            np.concatenate(
                [p.reshape(Se * Wt, 128) for p in planes], axis=1
            ).astype(jnp.bfloat16)
        )  # (Se*Wt, 896)

    def _build_fused_search(
        self, bits: np.ndarray, ckpt: np.ndarray, force: bool = False
    ) -> None:
        """Byte-plane table for the fused Pallas search kernel
        (ops/fm_pallas.py): the whole backward search runs inside one
        kernel, one-hot table-scan rank on the MXU, no HBM intermediates.

        Skipped on the CPU backend unless ``force`` (interpret-mode Pallas
        is ~10x slower than the XLA scan there; the kernel is covered by a
        dedicated forced parity test + the TPU bench)."""
        import jax as _jax

        from rust_bio_tpu.ops import fm_pallas

        if not force and _jax.default_backend() == "cpu":
            self._fs_cfg = None
            return
        cfg = fm_pallas.fused_search_feasible(self.n, bits.shape[1])
        if cfg is None:
            self._fs_cfg = None
            return
        wpr, qtb = cfg
        Tt, base, swt_pad = fm_pallas.build_search_table(bits, ckpt, wpr)
        self._fs_Tt = jnp.asarray(Tt)
        self._fs_base = [int(v) for v in base]  # indexed by symbol rank
        # bytes outside the alphabet (sym == -1) use the shared zero rows
        self._fs_zero_base = int(base.max())
        self._fs_cfg = dict(n=self.n, wpr=wpr, swt_pad=swt_pad, qtb=qtb)

    def _rank_mxu(self, r, sym, mxu_T=None):
        """MXU-rank: one-hot table scan instead of a per-query gather.

        ``r`` (Q,) int32 (>= -1), ``sym`` (Q,) int32 (>= 0)."""
        if mxu_T is None:
            mxu_T = self._mxu_T
        r = jnp.asarray(r, I32)
        sym = jnp.asarray(sym, I32)
        w = jnp.maximum(r, 0) >> 5
        bitpos = jnp.maximum(r, 0) & 31
        # per-symbol row base via tiny-table select (a gather would
        # scalarize); absent symbols map to the shared zero row
        base = jnp.zeros_like(sym)
        for si in range(int(self._mxu_base.shape[0])):
            base = jnp.where(sym == si, self._mxu_base[si], base)
        row = base + (w >> 7)  # (Q,)
        col = w & 127
        oh = (
            row[:, None] == jnp.arange(self._mxu_swt, dtype=I32)[None, :]
        ).astype(jnp.bfloat16)
        R = jax.lax.dot_general(
            oh,
            mxu_T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, 896): 7 byte-planes x 128 word columns
        Q = r.shape[0]
        colmask = jnp.arange(128, dtype=I32)[None, None, :] == col[:, None, None]
        vals = jnp.sum(
            jnp.where(colmask, R.reshape(Q, 7, 128), 0.0), axis=2
        ).astype(I32)  # (Q, 7): 3 ckpt bytes + 4 bit-plane bytes
        ck = vals[:, 0] | (vals[:, 1] << 8) | (vals[:, 2] << 16)
        word = jax.lax.bitcast_convert_type(
            vals[:, 3] | (vals[:, 4] << 8) | (vals[:, 5] << 16) | (vals[:, 6] << 24),
            jnp.uint32,
        )
        mask = jnp.where(
            bitpos == 31,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (bitpos + 1).astype(jnp.uint32)) - jnp.uint32(1),
        )
        cnt = ck + jax.lax.population_count(word & mask).astype(I32)
        return jnp.where(r < 0, 0, cnt)

    def _rank_dispatch(self, r, sym, fused=None, mxu_T=None):
        """1-D rank through the MXU path when the table is small enough."""
        if self._mxu_swt:
            return self._rank_mxu(r, sym, mxu_T)
        return self._rank(r, sym, fused)

    def _rank(self, r, sym, fused=None):
        """Batched rank: occurrences of symbol-index ``sym`` in bwt[..r+1].

        ``r`` may be -1 (returns 0). Shapes broadcast.  In u32 mode
        (n >= 2^31) ``r`` is uint32 and 0xFFFFFFFF plays the role of -1
        (an ``l - 1`` underflow wraps to exactly that value); the rank
        COUNT itself is per-symbol and fits int32 for any real alphabet.

        ``fused`` must be passed explicitly from INSIDE jitted code: the
        default reads ``self._fused``, which a jit would bake in as a
        compile-time constant (genome-sized HLO; the remote compile
        service rejects the request body outright)."""
        if fused is None:
            fused = self._fused
        sym = jnp.asarray(sym, I32)
        if self._big:
            r = jnp.asarray(r, U32)
            invalid = r == _UMAX
            rv = jnp.where(invalid, jnp.uint32(0), r)
            w = (rv >> 5).astype(I32)  # word index < 2^27: i32-safe
            bitpos = (rv & 31).astype(I32)
        else:
            r = jnp.asarray(r, I32)
            invalid = r < 0
            w = jnp.maximum(r, 0) >> 5
            bitpos = jnp.maximum(r, 0) & 31
        pair = fused[sym, w]  # (..., 2): packed word | checkpoint
        word = jax.lax.bitcast_convert_type(pair[..., 0], jnp.uint32)
        mask = jnp.where(
            bitpos == 31,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (bitpos + 1).astype(jnp.uint32)) - jnp.uint32(1),
        )
        cnt = pair[..., 1] + jax.lax.population_count(word & mask).astype(I32)
        return jnp.where(invalid, 0, cnt)

    def occ(self, r, a):
        """Batched occ by symbol byte ``a`` (matches Occ::get semantics)."""
        return self._rank(r, self.sym_of[jnp.asarray(a, I32)])

    def ensure_row_layout(self):
        """(nw, 2S) row-major twin of the fused table: one slice gather
        per POSITION retrieves every symbol's word+checkpoint (the
        FMD bidirectional extension ranks all KE extension-order symbols
        at both interval ends — per-(position, symbol) element gathers
        cost KE x the slices).  Built on demand (S * n/4 extra bytes)."""
        if getattr(self, "_fused_rows", None) is None:
            bits = np.asarray(self.bits).view(np.int32)
            ckpt = np.asarray(self.ckpt)
            self._fused_rows = jnp.asarray(
                np.concatenate([bits.T, ckpt.T], axis=1)
            )  # (nw, 2S): words then checkpoints
        return self._fused_rows

    def _rank_all(self, r, fused_rows):
        """(Q, S) rank of EVERY symbol at positions ``r`` ((Q,), >= -1)
        via one row gather per position."""
        S = len(self.symbols)
        r = jnp.asarray(r, I32)
        w = jnp.maximum(r, 0) >> 5
        bitpos = jnp.maximum(r, 0) & 31
        rows = fused_rows[w]  # (Q, 2S)
        words = jax.lax.bitcast_convert_type(rows[:, :S], jnp.uint32)
        cks = rows[:, S:]
        mask = jnp.where(
            bitpos == 31,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (bitpos + 1).astype(jnp.uint32)) - jnp.uint32(1),
        )
        cnt = cks + jax.lax.population_count(
            words & mask[:, None]
        ).astype(I32)
        return jnp.where((r < 0)[:, None], 0, cnt)

    # ------------------------------------------------------------------
    def _search_kernel(self, pats, plens):
        """Batched backward search. pats (B, L) uint8, plens (B,) int32.

        Returns status (B,), lower (B,), upper (B,), matched_len (B,)
        replicating fmindex.rs:144-208 exactly.  Thin wrapper: the index
        arrays go in as runtime ARGUMENTS (a jit closure would embed the
        genome-sized tables as HLO constants)."""
        return self._search_impl(
            self._fused,
            self._mxu_T if self._mxu_swt else self._fused,
            self._fs_Tt if self._fs_cfg is not None else self._fused,
            pats,
            plens,
        )

    @partial(jax.jit, static_argnums=(0,))
    def _search_impl(self, fused, mxu_T, fs_Tt, pats, plens):
        B, L = pats.shape
        n = self.n

        # Hoist all per-step gathers out of the scan: right-align every
        # pattern (step t reads pattern position plens-1-t), then map
        # bytes -> symbol index and -> less via tiny-table selects (a
        # (256,)-table gather scalarizes at ~35 ns/lane/step on TPU).
        # The per-row variable alignment is a log-step barrel shift of the
        # flipped batch (static rolls + selects) — a take_along_axis here
        # scalarizes to ~15 ms at B = 64K.
        t_iota = jnp.arange(L, dtype=I32)
        a_cols = jnp.flip(pats, axis=1).astype(I32)  # row t = pats[L-1-t]
        shift = (L - plens)[:, None]  # roll left so row t = pats[plens-1-t]
        k = 1
        while k < L:
            a_cols = jnp.where(
                (shift & k) != 0, jnp.roll(a_cols, -k, axis=1), a_cols
            )
            k <<= 1
        # steps t >= plens read wrapped junk; they are inactive in every
        # consumer (active = t < plens)
        IDX = U32 if self._big else I32
        sym_cols = jnp.full((B, L), -1, I32)
        less_cols = jnp.zeros((B, L), IDX)
        use_fs = self._fs_cfg is not None
        base_cols = (
            jnp.full((B, L), self._fs_zero_base, I32) if use_fs else None
        )
        for si, sbyte in enumerate(self.symbols):
            hit = a_cols == sbyte
            sym_cols = jnp.where(hit, si, sym_cols)
            less_cols = jnp.where(hit, self.less_sym[si], less_cols)
            if use_fs:
                base_cols = jnp.where(hit, self._fs_base[si], base_cols)

        if use_fs:
            # fused Pallas search: one kernel for all L steps (rank via
            # in-VMEM one-hot MXU table scan, ops/fm_pallas.py)
            from rust_bio_tpu.ops.fm_pallas import backward_search_fused

            qtb = self._fs_cfg["qtb"]
            Bp = -(-B // qtb) * qtb
            sc = jnp.transpose(sym_cols, (1, 0))
            lc = jnp.transpose(less_cols, (1, 0))
            bc = jnp.transpose(base_cols, (1, 0))
            pls = plens
            if Bp != B:
                sc = jnp.pad(sc, ((0, 0), (0, Bp - B)), constant_values=-1)
                lc = jnp.pad(lc, ((0, 0), (0, Bp - B)))
                bc = jnp.pad(
                    bc,
                    ((0, 0), (0, Bp - B)),
                    constant_values=self._fs_zero_base,
                )
                pls = jnp.pad(plens, (0, Bp - B))
            status, lower, upper, mlen = backward_search_fused(
                sc, lc, bc, pls, fs_Tt, **self._fs_cfg
            )
            return status[:B], lower[:B], upper[:B], mlen[:B]

        def step(carry, xs):
            l, r, pl, pr, mlen, complete, done = carry
            t, sym, less_a = xs
            active = (t < plens) & ~done
            valid_sym = sym >= 0

            pl_n = jnp.where(active, l, pl)
            pr_n = jnp.where(active, r, pr)
            # both bounds in ONE fused rank lookup (per-step gathers are
            # the cost on TPU; MXU table-scan when the reference is small)
            sym_m = jnp.maximum(sym, 0)
            occ2 = self._rank_dispatch(
                jnp.concatenate([r, l - 1]),
                jnp.concatenate([sym_m, sym_m]),
                fused,
                mxu_T,
            )
            occ_r = jnp.where(valid_sym, occ2[:B], 0)
            # underflow guard (issue #606): occ_r == 0 -> stop, no match here
            fail0 = occ_r == 0
            occ_lm1 = jnp.where((l > 0) & valid_sym, occ2[B:], 0)
            l_new = less_a + occ_lm1.astype(IDX)
            r_new = less_a + occ_r.astype(IDX) - 1  # u32: wraps iff fail0
            fail1 = l_new > r_new
            fail = fail0 | fail1
            upd = active & ~fail
            l2 = jnp.where(upd, l_new, l)
            r2 = jnp.where(upd, r_new, r)
            mlen2 = jnp.where(upd, mlen + 1, mlen)
            complete2 = jnp.where(active & fail, False, complete)
            done2 = done | (active & fail)
            return (l2, r2, pl_n, pr_n, mlen2, complete2, done2), None

        init = (
            jnp.zeros(B, IDX),
            jnp.full(B, n - 1, IDX),
            jnp.zeros(B, IDX),
            jnp.full(B, n - 1, IDX),
            jnp.zeros(B, I32),
            jnp.ones(B, bool),
            jnp.zeros(B, bool),
        )
        (l, r, pl, pr, mlen, complete, _), _ = jax.lax.scan(
            step, init, (t_iota, sym_cols.T, less_cols.T)
        )
        status = jnp.where(
            mlen > 0, jnp.where(complete, COMPLETE, PARTIAL), ABSENT
        )
        lower = jnp.where(complete, l, pl)
        upper = jnp.where(complete, r, pr) + 1
        return status, lower, upper, mlen

    # ------------------------------------------------------------------
    # k-mer prefix LUT: the large-text accelerator.  At genome scale the
    # per-step rank gathers dominate (each is a scalarized HBM slice
    # fetch); a (4^q, 2) table of backward-search intervals for every DNA
    # q-mer collapses the first q steps of every query into ONE gather.
    # Queries whose q-suffix is not a present DNA q-mer (or shorter than
    # q) are flagged and re-run through the exact scan kernel, so
    # Complete/Partial/Absent semantics stay reference-exact.
    # (No counterpart in the reference — fmindex.rs walks every symbol —
    # but standard FM practice, e.g. bwa's k-mer interval table.)
    def build_kmer_lut(self, q: int = 12) -> None:
        """Host-side LUT build (numpy; ~seconds at 100 Mbp, one-time) +
        one HBM upload of 8 * 4^q bytes (134 MB at q = 12)."""
        b = self.bwt_host()
        less = np.asarray(self.less).astype(np.int64)
        dna_bytes = [x for x in (65, 67, 71, 84) if self.sym_of[x] >= 0]
        if len(dna_bytes) < 4:
            dna_bytes = [65, 67, 71, 84]  # degenerate texts: table of empties
        # full cumulative counts as ONE (n, 4) row-major array: each rank
        # lookup of a position fetches all four symbols from one cache
        # line (per-symbol arrays cost 4x the random-access misses; the
        # build is gather-bound at genome scale)
        C4 = np.empty((len(b), 4), np.int32)
        for ci, sym in enumerate(dna_bytes):
            np.cumsum(b == sym, dtype=np.int32, out=C4[:, ci])
        lessv = np.array([less[sym] for sym in dna_bytes], np.int64)
        l = lessv.copy()
        r = np.array([less[sym + 1] - 1 for sym in dna_bytes], np.int64)
        for _k in range(1, q):
            occ_l4 = np.where(
                (l > 0)[:, None], C4[np.maximum(l - 1, 0)], 0
            ).astype(np.int64)  # (sz, 4)
            occ_r4 = np.where(
                (r >= 0)[:, None], C4[np.maximum(r, 0)], 0
            ).astype(np.int64)
            # new code = ci * 4^k + old code: symbol-major concatenation
            nl = (lessv[:, None] + occ_l4.T).reshape(-1)
            nr = (lessv[:, None] + occ_r4.T - 1).reshape(-1)
            l, r = nl, nr
        self._lut_q = q
        self._lut = jnp.asarray(
            np.stack([l, r], axis=1).astype(
                np.uint32 if self._big else np.int32
            )
        )  # (4^q, 2)
        lut_rank = np.full(256, -1, np.int32)
        for ci, cb in enumerate(dna_bytes):
            lut_rank[cb] = ci
        self._lut_rank = lut_rank  # host-side byte -> LUT symbol rank

    def _search_kernel_lut(self, pats, plens):
        """Backward search with the q-mer LUT jump: one table gather
        replaces the first q scan steps.  Returns (status, lower, upper,
        matched_len, miss); ``miss`` lanes (q-suffix not a present DNA
        q-mer, or pattern shorter than q) carry garbage and must be re-run
        through ``_search_kernel`` (see ``search_batch_lut``)."""
        return self._search_lut_impl(self._fused, self._lut, pats, plens)

    @partial(jax.jit, static_argnums=(0,))
    def _search_lut_impl(self, fused, lut, pats, plens):
        B, L = pats.shape
        q = self._lut_q
        n = self.n

        t_iota = jnp.arange(L, dtype=I32)
        a_cols = jnp.flip(pats, axis=1).astype(I32)
        shift = (L - plens)[:, None]
        k = 1
        while k < L:
            a_cols = jnp.where(
                (shift & k) != 0, jnp.roll(a_cols, -k, axis=1), a_cols
            )
            k <<= 1
        IDX = U32 if self._big else I32
        sym_cols = jnp.full((B, L), -1, I32)
        less_cols = jnp.zeros((B, L), IDX)
        lut_cols = jnp.full((B, L), -1, I32)
        for si, sbyte in enumerate(self.symbols):
            hit = a_cols == sbyte
            sym_cols = jnp.where(hit, si, sym_cols)
            less_cols = jnp.where(hit, self.less_sym[si], less_cols)
            lr = int(self._lut_rank[sbyte])
            if lr >= 0:
                lut_cols = jnp.where(hit, lr, lut_cols)

        # q-suffix code: step t processes pattern[plens-1-t], so code =
        # sum_t lut_rank[t] * 4^t matches the LUT's big-endian build order
        head = lut_cols[:, :q]
        miss = (plens < q) | jnp.any(head < 0, axis=1)
        pow4 = jnp.asarray(4 ** np.arange(q), I32)  # 4^q < 2^31 for q <= 15
        code = jnp.sum(jnp.maximum(head, 0) * pow4[None, :], axis=1)
        pair = lut[jnp.where(miss, 0, code)]
        l0 = pair[:, 0]
        r0 = pair[:, 1]
        miss = miss | (l0 > r0)

        def step(carry, xs):
            l, r, pl, pr, mlen, complete, done = carry
            t, sym, less_a = xs
            active = (t < plens) & ~done
            valid_sym = sym >= 0
            pl_n = jnp.where(active, l, pl)
            pr_n = jnp.where(active, r, pr)
            sym_m = jnp.maximum(sym, 0)
            occ2 = self._rank(
                jnp.concatenate([r, l - 1]),
                jnp.concatenate([sym_m, sym_m]),
                fused,
            )
            occ_r = jnp.where(valid_sym, occ2[:B], 0)
            fail0 = occ_r == 0
            occ_lm1 = jnp.where((l > 0) & valid_sym, occ2[B:], 0)
            l_new = less_a + occ_lm1.astype(IDX)
            r_new = less_a + occ_r.astype(IDX) - 1  # u32: wraps iff fail0
            fail = fail0 | (l_new > r_new)
            upd = active & ~fail
            l2 = jnp.where(upd, l_new, l)
            r2 = jnp.where(upd, r_new, r)
            mlen2 = jnp.where(upd, mlen + 1, mlen)
            complete2 = jnp.where(active & fail, False, complete)
            done2 = done | (active & fail)
            return (l2, r2, pl_n, pr_n, mlen2, complete2, done2), None

        init = (
            l0, r0, l0, r0,
            jnp.full(B, q, I32),
            jnp.ones(B, bool),
            miss,  # miss lanes are re-run by the caller; freeze them here
        )
        (l, r, pl, pr, mlen, complete, _), _ = jax.lax.scan(
            step,
            init,
            (t_iota[q:], sym_cols.T[q:], less_cols.T[q:]),
        )
        status = jnp.where(
            mlen > 0, jnp.where(complete, COMPLETE, PARTIAL), ABSENT
        )
        lower = jnp.where(complete, l, pl)
        upper = jnp.where(complete, r, pr) + 1
        return status, lower, upper, mlen, miss

    def search_batch_lut(self, pats, plens):
        """(status, lower, upper, mlen) with the LUT fast path; miss lanes
        re-run through the exact kernel in a pow2 bucket. Results are
        bit-identical to ``_search_kernel`` (property-tested)."""
        assert getattr(self, "_lut_q", None) is not None, "build_kmer_lut first"
        pats_d = jnp.asarray(pats)
        plens_d = jnp.asarray(plens)
        status, lower, upper, mlen, miss = (
            np.array(v) for v in self._search_kernel_lut(pats_d, plens_d)
        )
        bad = np.nonzero(miss)[0]
        if bad.size:
            cap = max(8, 1 << (int(bad.size) - 1).bit_length())
            sel = np.pad(bad, (0, cap - bad.size))
            st2, lo2, up2, ml2 = jax.tree.map(
                np.asarray,
                self._search_kernel(pats_d[sel], plens_d[sel]),
            )
            status[bad] = st2[: bad.size]
            lower[bad] = lo2[: bad.size]
            upper[bad] = up2[: bad.size]
            mlen[bad] = ml2[: bad.size]
        return status, lower, upper, mlen

    def backward_search_batch(self, patterns) -> List[BackwardSearchResult]:
        """Batch of backward searches; exact reference result objects."""
        pats = [to_array(p) for p in patterns]
        B = len(pats)
        L = max((len(p) for p in pats), default=1) or 1
        pb = np.zeros((B, L), dtype=np.uint8)
        plens = np.zeros(B, dtype=np.int32)
        for i, p in enumerate(pats):
            pb[i, : len(p)] = p
            plens[i] = len(p)
        status, lower, upper, mlen = jax.tree.map(
            np.asarray, self._search_kernel(jnp.asarray(pb), jnp.asarray(plens))
        )
        out = []
        for i in range(B):
            if status[i] == COMPLETE:
                out.append(
                    BackwardSearchResult.complete(
                        Interval(int(lower[i]), int(upper[i]))
                    )
                )
            elif status[i] == PARTIAL:
                out.append(
                    BackwardSearchResult.partial(
                        Interval(int(lower[i]), int(upper[i])), int(mlen[i])
                    )
                )
            else:
                out.append(BackwardSearchResult.absent())
        return out

    # ------------------------------------------------------------------
    def _locate_kernel(self, rows):
        """Batched sampled-SA lookup via LF-walk (suffix_array.rs:157-184).

        Single-sentinel texts only (no extra_rows patching needed).
        """
        assert self.sa_sample is not None, "index built without suffix array"
        return self._locate_impl(
            self._fused,
            self._mxu_T if self._mxu_swt else self._fused,
            self.bwt_sym,
            self.sa_sample,
            self.sent_rows,
            self.sent_vals,
            rows,
        )

    @partial(jax.jit, static_argnums=(0,))
    def _locate_impl(
        self, fused, mxu_T, bwt_sym, sa_sample, sent_rows, sent_vals, rows
    ):
        IDX = U32 if self._big else I32
        s = IDX(self.s) if self._big else self.s
        S = len(self.symbols)

        def cond(carry):
            return ~jnp.all(carry[2])

        def body(carry):
            pos, offset, done = carry
            # one symbol gather per step; the sentinel row is sym == 0
            # (smallest symbol), which is the reference's extra_rows patch
            # (suffix_array.rs:166-175) specialized to one final sentinel
            sym = bwt_sym[pos].astype(I32)
            done2 = done | ((pos % s) == 0) | (sym == 0)
            less_v = jnp.zeros_like(pos)
            for si in range(S):  # tiny-table select, not a gather
                less_v = jnp.where(sym == si, self.less_sym[si], less_v)
            # pos - 1 at the (done) sentinel row pos==0 wraps to the u32
            # "-1" sentinel / stays -1 in i32 — rank returns 0 either way
            nxt = less_v + self._rank_dispatch(
                pos - 1, jnp.maximum(sym, 0), fused, mxu_T
            ).astype(IDX)
            pos2 = jnp.where(done2, pos, nxt)
            offset2 = jnp.where(done2, offset, offset + 1)
            return pos2, offset2, done2

        pos0 = jnp.asarray(rows, IDX)
        B = pos0.shape[0]
        pos, offset, _ = jax.lax.while_loop(
            cond, body, (pos0, jnp.zeros(B, I32), jnp.zeros(B, bool))
        )
        sampled = (pos % s) == 0
        # non-sampled stops are sentinel-BWT rows: exact values from the
        # extra_rows table (binary search over the few sentinel rows)
        si = jnp.clip(
            jnp.searchsorted(sent_rows, pos), 0, sent_rows.shape[0] - 1
        )
        sent_base = jnp.where(sent_rows[si] == pos, sent_vals[si], 0)
        base = jnp.where(sampled, sa_sample[pos // s], sent_base)
        return base + offset.astype(base.dtype)

    def locate_batch(self, rows) -> np.ndarray:
        """Text positions for a batch of suffix-array row indices.

        The batch is padded to a power-of-two bucket so repeated calls with
        varying row counts reuse one compiled LF-walk (an unpadded call
        recompiles the while_loop for every distinct shape)."""
        handle, nb = self.locate_batch_async(rows)
        if handle is None:
            return np.asarray(rows, np.uint32 if self._big else np.int32)
        return np.asarray(handle)[:nb]

    def locate_batch_async(self, rows):
        """Dispatch the bucketed LF-walk without syncing: returns
        (device handle, true row count); ``np.asarray(handle)[:nb]``
        collects.  The walk is lockstep-latency-bound (~25 ms even for a
        handful of rows), so callers overlap it with host work."""
        rows = np.asarray(rows, np.uint32 if self._big else np.int32)
        nb = rows.shape[0]
        if nb == 0:
            return None, 0
        cap = max(16, 1 << (nb - 1).bit_length())
        rp = np.pad(rows, (0, cap - nb))
        return self._locate_kernel(jnp.asarray(rp)), nb

    def locate_interval(self, interval: Interval) -> np.ndarray:
        return self.locate_batch(np.arange(interval.lower, interval.upper))
