"""Multimap of genomic annotations queryable by location overlap.

Reference parity: src/data_structures/annot_map.rs — per-refseq
``IntervalTree`` multimap, ``insert_at``/``insert_loc``/``find``
(:104-180). Locations are "Loc" duck-typed objects (``refid``/``start``/
``length``), e.g. ``rust_bio_tpu.types.Contig``.
"""

from __future__ import annotations

from typing import Any, Dict, Generic, Iterator, TypeVar

from rust_bio_tpu.data_structures.interval_tree import Entry, IntervalTree

T = TypeVar("T")


class AnnotMap(Generic[T]):
    def __init__(self) -> None:
        self._refid_itrees: Dict[Any, IntervalTree] = {}

    @classmethod
    def new(cls) -> "AnnotMap":
        return cls()

    def insert_at(self, data, location) -> None:
        """Insert ``data`` at a Loc's region (annot_map.rs:104)."""
        tree = self._refid_itrees.setdefault(location.refid, IntervalTree())
        tree.insert((location.start, location.start + location.length), data)

    def insert_loc(self, data) -> None:
        """Insert a Loc-like object at its own region (annot_map.rs:172)."""
        self.insert_at(data, data)

    def find(self, location) -> Iterator[Entry]:
        """Entries overlapping the query location (annot_map.rs:119)."""
        tree = self._refid_itrees.get(location.refid)
        if tree is None:
            return iter(())
        return tree.find((location.start, location.start + location.length))
