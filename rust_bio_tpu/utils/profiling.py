"""Tracing, per-batch stats, and debug checking (SURVEY §5 aux subsystems).

The reference has no tracing/metrics at all (a Rust library); the TPU
framework exposes three light host-side primitives:

- ``trace(out_dir)``: capture a ``jax.profiler`` trace of the enclosed
  block (viewable in TensorBoard / Perfetto);
- ``annotate(name)``: name a region inside an existing trace (shows up on
  the TraceMe timeline);
- ``Stats``: structured per-batch throughput accumulator (reads/s,
  cells/s, device seconds) with a one-line summary — the production
  observability hook used by ``pipelines.stream.StreamingMapper``;
- ``checked(fn)``: debug-mode wrapper running ``fn`` under
  ``jax.experimental.checkify`` with NaN + out-of-bounds checks enabled
  (the framework's analogue of the reference's fuzzing with
  ``overflow-checks = true``). Returns the checked callable; call
  ``.throw()`` semantics are applied automatically.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture a jax.profiler trace of the enclosed block into out_dir."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside an active trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Stats:
    """Structured per-batch stats accumulator."""

    def __init__(self) -> None:
        self.batches: List[Dict] = []

    def record(self, **kw) -> None:
        kw.setdefault("t", time.time())
        self.batches.append(kw)

    def total(self, key: str) -> float:
        return float(sum(b.get(key, 0) for b in self.batches))

    def summary(self) -> Dict:
        reads = self.total("reads")
        secs = self.total("seconds")
        return {
            "batches": len(self.batches),
            "reads": int(reads),
            "seconds": secs,
            "reads_per_s": reads / secs if secs else 0.0,
        }


def checked(fn: Callable, errors=None) -> Callable:
    """Debug-mode wrapper: run ``fn`` under checkify (NaN / OOB / div).

    Usage: ``checked(my_jitted_fn)(*args)`` raises on the first NaN or
    out-of-bounds index produced inside the traced computation.
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
