"""Data-parallel read pipelines over a device mesh.

The scale-out story (SURVEY §2.7, §5.8): read batches are sharded on the
'data' mesh axis; indexes (score LUTs, FM-index rank arrays) are replicated
per device; per-shard results come back as one sharded array (XLA inserts
the ICI collectives). On one host with N devices this runs SPMD via
``jax.jit`` + ``NamedSharding``; across hosts the same code runs under
``jax.distributed.initialize`` with DCN carrying only the final gathers.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu import parallel
from rust_bio_tpu.alignment.pairwise.batched import (
    BatchAligner,
    _align_batch_device,
)
from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring
from rust_bio_tpu.pipelines.read_mapper import ReadMapper


def _pad_to_multiple(arrs, lens, multiple: int):
    B = arrs.shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return arrs, lens, B
    pad_arr = np.zeros((rem,) + arrs.shape[1:], dtype=arrs.dtype)
    pad_len = np.zeros(rem, dtype=lens.dtype)
    return (
        np.concatenate([arrs, pad_arr]),
        np.concatenate([lens, pad_len]),
        B,
    )


class ShardedAligner:
    """Batched SW aligner sharded over the mesh's 'data' axis.

    Scores (and optionally full tracebacks) for arbitrarily large read
    batches; lanes are padded to a multiple of the data-axis size and
    masked by length, so results are identical to the single-device kernel.
    """

    def __init__(self, scoring: Scoring, mesh=None) -> None:
        self.scoring = scoring
        self.mesh = mesh if mesh is not None else parallel.make_mesh()
        self._lut = jax.device_put(
            jnp.asarray(scoring.dense_lut()),
            parallel.replicated_sharding(self.mesh),
        )

    def _pen(self, clips):
        s = self.scoring
        return jax.device_put(
            jnp.asarray(
                np.array([s.gap_open, s.gap_extend, *clips], np.int32)
            ),
            parallel.replicated_sharding(self.mesh),
        )

    def scores(self, xb, yb, mlens, nlens, mode: str = "global") -> np.ndarray:
        """(B,) alignment scores, sharded execution over the mesh."""
        clips = {
            "global": (MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE),
            "semiglobal": (MIN_SCORE, MIN_SCORE, 0, 0),
            "local": (0, 0, 0, 0),
            "custom": (
                self.scoring.xclip_prefix,
                self.scoring.xclip_suffix,
                self.scoring.yclip_prefix,
                self.scoring.yclip_suffix,
            ),
        }[mode]
        n_data = self.mesh.shape["data"]
        xb = np.asarray(xb, dtype=np.uint8)
        yb = np.asarray(yb, dtype=np.uint8)
        mlens = np.asarray(mlens, dtype=np.int32)
        nlens = np.asarray(nlens, dtype=np.int32)
        xb, mlens, B = _pad_to_multiple(xb, mlens, n_data)
        yb, nlens, _ = _pad_to_multiple(yb, nlens, n_data)
        xb_d, yb_d, ml_d, nl_d = parallel.shard_batch(
            self.mesh, xb, yb, mlens, nlens
        )
        pen = self._pen(clips)

        out = _align_batch_device(
            xb_d, yb_d, ml_d, nl_d, self._lut, pen, with_traceback=False
        )
        return np.asarray(out["score"])[:B]


class ShardedFMIndex:
    """FM-index searched over a sharded pattern batch.

    ``index_sharding="replicated"`` (default): the packed rank arrays are
    replicated on every device and the pattern batch shards on 'data' —
    the right layout while the genome fits one device's HBM.

    ``index_sharding="occ_sharded"``: the bit-plane and checkpoint arrays
    shard along the word axis over the 'model' mesh axis (each device holds
    a contiguous slice of the BWT's packed words). Rank queries then gather
    across shards — XLA partitions the gather and inserts the ICI exchange.
    This is the >HBM-genome layout (SURVEY §5.8 option b).
    """

    def __init__(self, device_index, mesh=None, index_sharding="replicated"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.index = device_index
        self.mesh = mesh if mesh is not None else parallel.make_mesh()
        repl = parallel.replicated_sharding(self.mesh)
        if index_sharding == "occ_sharded":
            # shard the packed word axis; pad so it divides the axis size
            n_model = self.mesh.shape["model"]
            n_data = self.mesh.shape["data"]
            axis = "model" if n_model > 1 else "data"
            nshard = n_model if n_model > 1 else n_data
            bits = np.asarray(self.index.bits)
            ckpt = np.asarray(self.index.ckpt)
            nw = bits.shape[1]
            pad = (-nw) % nshard
            if pad:
                bits = np.pad(bits, ((0, 0), (0, pad)))
                # checkpoint padding must stay monotone for sound reads
                ckpt = np.pad(ckpt, ((0, 0), (0, pad)), mode="edge")
            shard = NamedSharding(self.mesh, P(None, axis))
            self.index.bits = jax.device_put(jnp.asarray(bits), shard)
            self.index.ckpt = jax.device_put(jnp.asarray(ckpt), shard)
            self.index._refresh_fused(
                NamedSharding(self.mesh, P(None, axis, None))
            )
        else:
            for name in ("bits", "ckpt"):
                setattr(
                    self.index, name,
                    jax.device_put(getattr(self.index, name), repl),
                )
            self.index._refresh_fused(repl)
        for name in ("less", "sym_of", "bwt_bytes"):
            setattr(
                self.index, name, jax.device_put(getattr(self.index, name), repl)
            )
        if self.index.sa_sample is not None:
            self.index.sa_sample = jax.device_put(self.index.sa_sample, repl)

    def backward_search_batch(self, patterns: Sequence) -> List:
        from rust_bio_tpu.utils.text import to_array

        pats = [to_array(p) for p in patterns]
        B = len(pats)
        n_data = self.mesh.shape["data"]
        L = max((len(p) for p in pats), default=1) or 1
        Bp = B + ((-B) % n_data)
        pb = np.zeros((Bp, L), dtype=np.uint8)
        plens = np.zeros(Bp, dtype=np.int32)
        for i, p in enumerate(pats):
            pb[i, : len(p)] = p
            plens[i] = len(p)
        pb_d, pl_d = parallel.shard_batch(self.mesh, pb, plens)
        status, lower, upper, mlen = jax.tree.map(
            np.asarray, self.index._search_kernel(pb_d, pl_d)
        )
        from rust_bio_tpu.data_structures.fmindex import (
            BackwardSearchResult,
            Interval,
        )
        from rust_bio_tpu.data_structures.fm_device import COMPLETE, PARTIAL

        out = []
        for i in range(B):
            if status[i] == COMPLETE:
                out.append(
                    BackwardSearchResult.complete(Interval(int(lower[i]), int(upper[i])))
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


class ShardedBatchAligner(BatchAligner):
    """``BatchAligner`` whose batches execute sharded over the mesh's
    'data' axis — full tracebacks and reference-exact decode included.

    The general XLA engine partitions cleanly under ``jit`` with
    ``NamedSharding`` inputs (Pallas kernels do not auto-partition, so the
    dispatch pins the XLA path); lanes are padded to a multiple of the
    data-axis size and sliced back after the walk.
    """

    def __init__(self, scoring: Scoring, mesh=None) -> None:
        super().__init__(scoring)
        self.mesh = mesh if mesh is not None else parallel.make_mesh()
        self._lut_repl = jax.device_put(
            jnp.asarray(scoring.dense_lut()),
            parallel.replicated_sharding(self.mesh),
        )

    def _dispatch(self, xb, yb, mlens, nlens, pen, with_traceback):
        n_data = self.mesh.shape["data"]
        xb = np.asarray(xb, dtype=np.uint8)
        yb = np.asarray(yb, dtype=np.uint8)
        mlens = np.asarray(mlens, dtype=np.int32)
        nlens = np.asarray(nlens, dtype=np.int32)
        xb, mlens, B = _pad_to_multiple(xb, mlens, n_data)
        yb, nlens, _ = _pad_to_multiple(yb, nlens, n_data)
        xb_d, yb_d, ml_d, nl_d = parallel.shard_batch(
            self.mesh, xb, yb, mlens, nlens
        )
        pen_d = jax.device_put(
            jnp.asarray(pen), parallel.replicated_sharding(self.mesh)
        )
        out = _align_batch_device(
            xb_d, yb_d, ml_d, nl_d, self._lut_repl, pen_d,
            with_traceback=with_traceback,
        )
        return {
            k: v[:, :B] if v.ndim == 2 else v[:B] for k, v in out.items()
        }


class ShardedReadMapper(ReadMapper):
    """Seed-and-extend read mapper running data-parallel over a mesh.

    The FM-index rank arrays are replicated per device (genome fits HBM);
    seed batches and extension batches shard on the 'data' axis. Host code
    (window slicing, result assembly) is unchanged from ``ReadMapper`` —
    this is the multi-chip production configuration of SURVEY §2.7.
    """

    def __init__(self, genome, mesh=None, **kwargs) -> None:
        super().__init__(genome, **kwargs)
        self.mesh = mesh if mesh is not None else parallel.make_mesh()
        # device_put the index arrays with replicated sharding in place
        self.sharded_index = ShardedFMIndex(self.index, self.mesh)
        self.aligner = ShardedBatchAligner(self.scoring, self.mesh)

    def _seed_search(self, pats, plens):
        # shard the seed batch on the 'data' axis (index is replicated)
        n_data = self.mesh.shape["data"]
        N = pats.shape[0]
        padn = -N % n_data
        if padn:
            pats = np.pad(pats, ((0, padn), (0, 0)))
            plens = np.pad(plens, (0, padn), constant_values=1)
        pats_d, plens_d = parallel.shard_batch(self.mesh, pats, plens)
        status, lower, _u, _m = self.index._search_kernel(pats_d, plens_d)
        return np.asarray(status)[:N], np.asarray(lower)[:N]
