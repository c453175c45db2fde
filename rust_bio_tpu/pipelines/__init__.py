"""End-to-end production pipelines built from the framework's kernels."""

from rust_bio_tpu.pipelines.read_mapper import (  # noqa: F401
    MappedRead,
    ReadMapper,
    SmemReadMapper,
)
