"""13-byte packed index entries.

Both the binned (.vcfci) and sparse-external index files store entries of
the native-endian packed form written field-by-field by the reference
(struct index_entry, main.cpp:600-626):

    u8  reference_name_idx
    u32 position          (little-endian on x86)
    u64 byte_offset       (little-endian on x86)

We emit little-endian explicitly — byte-identical on the platforms the
reference ran on.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

ENTRY_SIZE = 13
_PACK = struct.Struct("<BIQ")


@dataclass(frozen=True)
class IndexEntry:
    reference_name_idx: int
    position: int
    byte_offset: int

    def pack(self) -> bytes:
        return _PACK.pack(self.reference_name_idx, self.position, self.byte_offset)

    @classmethod
    def unpack(cls, buf: bytes, offset: int = 0) -> "IndexEntry":
        r, p, b = _PACK.unpack_from(buf, offset)
        return cls(r, p, b)

    @property
    def is_empty(self) -> bool:
        """All-zero entries mark holes in sparse index files
        (main.cpp:1097)."""
        return self.reference_name_idx == 0 and self.position == 0 and self.byte_offset == 0
