"""Fixed-width bit-packed symbol vector.

Reference parity: src/data_structures/bitenc.rs — 1..8-bit values packed
into u32 blocks (:75-294): new/with_capacity/push/push_values/set/get/
iter/clear/len/nr_blocks/nr_symbols. The packed u32 block array is exactly
the device layout used for 2-bit DNA on TPU (HBM-resident, gather + shift).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np


class BitEnc:
    def __init__(self, width: int) -> None:
        assert 1 <= width <= 8, (
            "BitEnc only supports encoding widths up to 8 bits"
        )
        self.width = width
        self.storage: List[int] = []
        self.mask = (1 << width) - 1
        self.len_ = 0
        self.usable_bits_per_block = 32 - (32 % width)

    @classmethod
    def new(cls, width: int) -> "BitEnc":
        return cls(width)

    @classmethod
    def with_capacity(cls, width: int, n: int) -> "BitEnc":
        return cls(width)

    def _addr(self, i: int):
        per_block = self.usable_bits_per_block // self.width
        return i // per_block, (i % per_block) * self.width

    def push(self, value: int) -> None:
        block, bit = self._addr(self.len_)
        if block >= len(self.storage):
            self.storage.append(0)
        self.set_by_addr(block, bit, value)
        self.len_ += 1

    def push_values(self, n: int, value: int) -> None:
        for _ in range(n):
            self.push(value)

    def set(self, i: int, value: int) -> None:
        assert i < self.len_, f"Index out of bounds: {i} >= {self.len_}"
        block, bit = self._addr(i)
        self.set_by_addr(block, bit, value)

    def set_by_addr(self, block: int, bit: int, value: int) -> None:
        v = self.storage[block]
        v = (v & ~(self.mask << bit)) | ((value & self.mask) << bit)
        self.storage[block] = v & 0xFFFFFFFF

    def get(self, i: int) -> Optional[int]:
        if i >= self.len_:
            return None
        block, bit = self._addr(i)
        return (self.storage[block] >> bit) & self.mask

    def iter(self) -> Iterator[int]:
        for i in range(self.len_):
            yield self.get(i)  # type: ignore[misc]

    def __iter__(self) -> Iterator[int]:
        return self.iter()

    def clear(self) -> None:
        self.storage.clear()
        self.len_ = 0

    def __len__(self) -> int:
        return self.len_

    def is_empty(self) -> bool:
        return self.len_ == 0

    def nr_blocks(self) -> int:
        return len(self.storage)

    def nr_symbols(self) -> int:
        return self.len_

    def to_array(self) -> np.ndarray:
        """Decode to a plain uint8 array."""
        return np.fromiter(self.iter(), dtype=np.uint8, count=self.len_)

    def blocks(self) -> np.ndarray:
        """The packed u32 block array (device-ready layout)."""
        return np.asarray(self.storage, dtype=np.uint32)
