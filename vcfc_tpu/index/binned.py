"""Binned index (.vcfci): build and query.

A .vcfci is a contiguous array of 13-byte entries, one per `entries_per_bin`
compressed data lines.  Entry.position holds the variant END position
(SV-aware) and grows to cover overlapping variants inside the bin — the
"generation 4" semantics of the reference (create_binned_index4,
main.cpp:1284-1637), which this builder reproduces byte-for-byte.

Query: binary search for the last entry at or before the query start, then
a linear scan of the compressed file from that entry's byte offset
(query_binned_index_binarysearch, main.cpp:2974-3349).
"""

from __future__ import annotations

import bisect
import time

from ..format.vcf import parse_metadata_headers
from ..query.coordinate import CoordinateQuery
from ..utils.config import BinnedIndexConfig
from ..utils.refmap import reference_to_int
from ..utils.timing import enabled as timing_enabled, record, timing_probe
from .entry import ENTRY_SIZE, IndexEntry
from .scan import header_at as _header_at, scan_lines


def build_binned_index(vcfc: bytes, config: BinnedIndexConfig) -> bytes:
    """Build the .vcfci byte stream for a .vcfc stream."""
    entries: list[IndexEntry] = []
    for line_number, rec in enumerate(scan_lines(vcfc)):
        end = rec.end_position()
        ridx = reference_to_int(rec.chrom)
        if not entries:
            entries.append(IndexEntry(ridx, end, rec.offset))
        elif line_number % config.entries_per_bin == 0:
            # bin boundary: new entry only if it extends coverage
            if end > entries[-1].position:
                entries.append(IndexEntry(ridx, end, rec.offset))
        else:
            # inside a bin: grow the previous entry's end cover
            if end > entries[-1].position:
                entries[-1] = IndexEntry(
                    entries[-1].reference_name_idx, end, entries[-1].byte_offset
                )
    return b"".join(e.pack() for e in entries)


def load_entries(vcfci: bytes) -> list[IndexEntry]:
    if len(vcfci) % ENTRY_SIZE != 0:
        raise ValueError(
            f"Index size {len(vcfci)} was not a multiple of entry size {ENTRY_SIZE}"
        )
    return [IndexEntry.unpack(vcfci, i) for i in range(0, len(vcfci), ENTRY_SIZE)]


def find_start_entry(entries: list[IndexEntry], query: CoordinateQuery) -> IndexEntry | None:
    """Last entry with (ref_idx, position) <= (query ref_idx, start); the
    first entry when the query starts before the index."""
    if not entries:
        return None
    key = (reference_to_int(query.reference_name), query.start_position)
    i = bisect.bisect_right(entries, key, key=lambda e: (e.reference_name_idx, e.position))
    return entries[max(i - 1, 0)]


def query_binned_index(vcfc: bytes, vcfci: bytes, query: CoordinateQuery):
    """Yield decompressed matching VCF lines (bytes incl. newline)."""
    header = parse_metadata_headers(vcfc)
    with timing_probe("index_search"):
        entries = load_entries(vcfci)
        entry = find_start_entry(entries, query)
    if entry is None:
        return
    # Disjoint seeking→iteration phase split (reference main.cpp:3276-3345):
    # `decompress_seeking` covers the scan from the bin start until the
    # first line at-or-past the query; `decompress_iteration` covers the
    # decode phase after.  A scan that never reaches the query emits
    # seeking only — the exact state machine of the TIMING contract the
    # harness graphs (command.py:135-158, evaluation_main.py:649-670).
    # Hits decode in batches through the native pipeline (query/bulk.py).
    from ..query.bulk import HitBuffer

    buf = HitBuffer(vcfc, header)
    probing = timing_enabled()
    t0 = time.perf_counter_ns() if probing else 0
    seeking = True
    try:
        for rec in scan_lines(vcfc, header=_header_at(header, entry.byte_offset)):
            cmp = query.compare_to_range(
                rec.chrom.decode(), rec.pos, rec.end_position()
            )
            if probing and seeking and cmp <= 0:
                now = time.perf_counter_ns()
                record("decompress_seeking", now - t0)
                t0, seeking = now, False
            if cmp == 0:
                yield from buf.add(rec)
            elif cmp < 0:
                break
        yield from buf.flush()
    finally:
        if probing:
            record(
                "decompress_seeking" if seeking else "decompress_iteration",
                time.perf_counter_ns() - t0,
            )

