"""Common utilities (reference parity: src/utils/)."""

from rust_bio_tpu.utils.text import Text, TextSlice, to_bytes, trim_newline
from rust_bio_tpu.utils.interval import Interval
from rust_bio_tpu.utils.fastexp import fastexp, fastexp_jax
from rust_bio_tpu.utils.scanops import prescan, scan

__all__ = [
    "Text",
    "TextSlice",
    "to_bytes",
    "trim_newline",
    "Interval",
    "fastexp",
    "fastexp_jax",
    "scan",
    "prescan",
]
