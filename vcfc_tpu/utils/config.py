"""Typed configuration layer.

The reference scatters configuration over compile-time macros, member
defaults and CLI overrides (SURVEY.md §5 "Config / flag system"); here it
is one dataclass layer.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SparseConfig:
    """Offset-as-index address computation (sparse.hpp:29-34,
    sparse.cpp:18-51).

    offset(ref, pos) = (max_position + pos) * multiplication_factor * block_size
    (the multi-ref-per-file variant replaces max_position with
    ref_ordinal * max_position; compile-time disabled in the reference via
    VCFC_SPARSE_MULTIPLE_REF_PER_FILE, sparse.hpp:15).
    """

    multiplication_factor: int = 4
    block_size: int = 4096
    max_position: int = 300_000_000
    multiple_ref_per_file: bool = False

    def compute_sparse_offset(self, reference_name: str | bytes, pos: int) -> int:
        from .refmap import reference_to_int

        if self.multiple_ref_per_file:
            offset = reference_to_int(reference_name) * self.max_position
        else:
            offset = self.max_position
        offset += pos
        offset *= self.multiplication_factor * self.block_size
        return offset


# The external index stores 13-byte entries, not whole lines, so the CLI
# drops F to 1 and B to 256 (main.cpp:27, 4152-4156).
SPARSE_EXTERNAL_INDEX_CONFIG = SparseConfig(multiplication_factor=1, block_size=256)


@dataclass(frozen=True)
class BinnedIndexConfig:
    """Binned .vcfci index: one entry per `entries_per_bin` data lines
    (main.cpp:588-597)."""

    entries_per_bin: int = 150


@dataclass(frozen=True)
class EngineConfig:
    """Device-path codec engine knobs."""

    line_batch: int = 2048  # lines per device dispatch
    sample_pad: int = 128  # pad sample axis to a multiple of this
    mesh_axis: str = "data"  # variant-line data-parallel axis name
