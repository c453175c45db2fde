"""Text primitives (reference parity: src/utils/text.rs).

The reference models sequences as ``Vec<u8>``/``&[u8]``. The TPU-native
equivalents are ``bytes`` on the host boundary and ``numpy``/``jax`` uint8
arrays on the compute path.
"""

from __future__ import annotations

from typing import Union

import numpy as np

# Host-side owned text / slice (reference: Text = Vec<u8>, TextSlice = &[u8]).
Text = bytes
TextSlice = bytes

TextLike = Union[bytes, bytearray, str, np.ndarray, list, tuple]


def to_bytes(seq: TextLike) -> bytes:
    """Coerce any supported sequence representation to ``bytes``."""
    if isinstance(seq, bytes):
        return seq
    if isinstance(seq, (bytearray, memoryview)):
        return bytes(seq)
    if isinstance(seq, str):
        return seq.encode("ascii")
    if isinstance(seq, np.ndarray):
        return seq.astype(np.uint8).tobytes()
    return bytes(seq)


def to_array(seq: TextLike) -> np.ndarray:
    """Coerce a sequence to a numpy uint8 array (device-feed layout)."""
    if isinstance(seq, np.ndarray):
        return np.ascontiguousarray(seq, dtype=np.uint8)
    return np.frombuffer(to_bytes(seq), dtype=np.uint8)


def trim_newline(s: str) -> str:
    """Remove a single trailing newline (reference: utils/text.rs)."""
    return s[:-1] if s.endswith("\n") else s
