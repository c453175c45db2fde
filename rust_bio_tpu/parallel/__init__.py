"""Data-parallel scale-out over a ``jax.sharding.Mesh``.

The reference has no distributed layer at all — its documented concurrency
model is "wrap the index in Arc and spawn OS threads"
(reference: src/lib.rs:173-210). The TPU-native design instead shards the
*batch* axis of read/pair batches over the device mesh with ``jax.jit`` +
``NamedSharding``; indexes (score LUTs, FM-index rank arrays) are replicated
per device, and hit/score merges ride XLA collectives over ICI.

Axes convention:
- ``data``: the read/pair batch axis (pure data parallelism).
- ``model``: reserved for index sharding (Occ-table partitioning) when a
  genome exceeds one chip's HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "device_count",
]


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With ``n_model == 1`` (default) this is pure data parallelism: every
    device holds a full replica of the index/LUTs and a slice of the batch.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    assert n_data * n_model == len(devs), (
        f"mesh {n_data}x{n_model} != {len(devs)} devices"
    )
    arr = np.asarray(devs).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (the batch) over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put each array with its batch axis sharded over 'data'.

    Batch sizes must be divisible by the 'data' axis size (callers pad
    batches to a multiple — padded lanes are masked by their length arrays).
    """
    out = []
    n_data = mesh.shape["data"]
    for a in arrays:
        a = np.asarray(a)
        assert a.shape[0] % n_data == 0, (
            f"batch {a.shape[0]} not divisible by data axis {n_data}"
        )
        out.append(jax.device_put(a, batch_sharding(mesh, a.ndim)))
    return tuple(out)
