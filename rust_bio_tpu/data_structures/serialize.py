"""Index persistence: build once, memory-map forever.

The reference gets this via serde derives on every index structure
(SURVEY §5: Occ bwt.rs:76, FMIndex fmindex.rs:213, SampledSuffixArray
suffix_array.rs:125). Here the packed arrays are written as a single
``.npz`` artifact with a version + content-hash header; device indexes are
rehydrated straight into HBM via ``jax.device_put`` per shard.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

FORMAT_VERSION = 1


def _content_hash(arrays: dict) -> str:
    h = hashlib.sha256()
    for key in sorted(arrays):
        h.update(key.encode())
        h.update(np.ascontiguousarray(arrays[key]).tobytes())
    return h.hexdigest()[:16]


def save_fm_index(
    path, device_index, compress: bool = True, extra_meta: dict | None = None
) -> None:
    """Persist a DeviceFMIndex's packed arrays (npz, versioned + hashed).

    ``extra_meta`` entries (e.g. a genome content hash) are merged into the
    header so loaders can validate provenance without re-reading arrays."""
    arrays = {
        "bits": np.asarray(device_index.bits),
        "ckpt": np.asarray(device_index.ckpt),
        **(
            {
                "sent_rows": np.asarray(device_index.sent_rows),
                "sent_vals": np.asarray(device_index.sent_vals),
            }
            if getattr(device_index, "sa_sample", None) is not None
            else {}
        ),
        "less": np.asarray(device_index.less),
        "sym_of": np.asarray(device_index.sym_of),
        "bwt_bytes": device_index.bwt_host(),
    }
    if device_index.sa_sample is not None:
        arrays["sa_sample"] = np.asarray(device_index.sa_sample)
    if getattr(device_index, "_lut", None) is not None:
        arrays["lut"] = np.asarray(device_index._lut)
        arrays["lut_rank"] = np.asarray(device_index._lut_rank)
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "fm_index",
        "n": int(device_index.n),
        "s": int(device_index.s),
        "sentinel": int(device_index.sentinel),
        "symbols": list(device_index.symbols),
        "lut_q": int(getattr(device_index, "_lut_q", 0)),
        "hash": _content_hash(arrays),
        **(extra_meta or {}),
    }
    # genome-scale artifacts (GBs) skip zlib: a 2.4 GB index compresses
    # for minutes but writes uncompressed in seconds
    saver = np.savez_compressed if compress else np.savez
    saver(
        path, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )


def load_fm_index(path, verify: bool = True, return_meta: bool = False):
    """Rehydrate a DeviceFMIndex; arrays go straight to device HBM.

    ``return_meta=True`` additionally returns the header dict (including
    any ``extra_meta`` recorded at save time)."""
    import jax.numpy as jnp

    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        assert meta["format_version"] == FORMAT_VERSION, (
            f"unsupported index format {meta['format_version']}"
        )
        assert meta["kind"] == "fm_index"
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    if verify:
        got = _content_hash(arrays)
        assert got == meta["hash"], (
            f"index artifact corrupted: hash {got} != {meta['hash']}"
        )

    idx = DeviceFMIndex.__new__(DeviceFMIndex)
    idx.n = meta["n"]
    idx.s = meta["s"]
    idx.sentinel = meta["sentinel"]
    idx.symbols = list(meta["symbols"])
    idx._big = idx.n >= 2**31  # u32 index arithmetic (see __init__)
    inp = np.uint32 if idx._big else np.int32
    idx.bits = np.asarray(arrays["bits"])  # host-side (see __init__)
    idx.ckpt = np.asarray(arrays["ckpt"])
    idx._refresh_fused()
    idx.less = jnp.asarray(np.asarray(arrays["less"]).astype(inp))
    idx.less_sym = jnp.asarray(
        np.asarray(arrays["less"])
        .astype(np.int64)[np.asarray(meta["symbols"], np.int64)]
        .astype(inp)
    )
    idx.sym_of = jnp.asarray(arrays["sym_of"])
    # host-side until a device consumer (locate) touches them — a 2 Gbp
    # index otherwise pays 4 GB of HBM + a ~60 s tunnel upload on load.
    # NOTE: set via the property setters; _refresh_fused above already
    # (re)decided _mxu_swt/_fs_cfg — do not reset them here (that would
    # silently disable the MXU/fused search paths on rehydrated indexes).
    idx.bwt_bytes = np.asarray(arrays["bwt_bytes"])
    idx.bwt_sym = (
        np.asarray(arrays["sym_of"])[np.asarray(arrays["bwt_bytes"])]
        .astype(np.uint8)
    )
    if "lut" in arrays:
        idx._lut_q = int(meta.get("lut_q", 12))
        idx._lut = jnp.asarray(arrays["lut"])
        idx._lut_rank = np.asarray(arrays["lut_rank"])
    idx.sa_sample = (
        jnp.asarray(arrays["sa_sample"]) if "sa_sample" in arrays else None
    )
    if "sent_rows" in arrays:
        idx.sent_rows = jnp.asarray(arrays["sent_rows"])
        idx.sent_vals = jnp.asarray(arrays["sent_vals"])
    return (idx, meta) if return_meta else idx
