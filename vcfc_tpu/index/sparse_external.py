"""Sparse external index (.vcfci-sparse).

Index-only variant of offset-as-index addressing: a filesystem-sparse file
holding 13-byte entries {u8 ref_idx, u32 pos, u64 byte_offset} at
offset(chrom,pos) with F=1, B=256 (create_sparse_external_index,
main.cpp:854-999; CLI config override main.cpp:4152-4157).  Queries seek
into the index, brute-search forward over zero entries with SEEK_DATA
(main.cpp:1130-1173), then scan the .vcfc from the entry's byte offset.
"""

from __future__ import annotations

import os
import time

from ..format.vcf import parse_metadata_headers
from ..query.coordinate import CoordinateQuery
from ..utils.config import SPARSE_EXTERNAL_INDEX_CONFIG, SparseConfig
from ..utils.refmap import reference_to_int
from ..utils.timing import enabled as timing_enabled, record, timing_probe
from .entry import ENTRY_SIZE, IndexEntry
from .scan import header_at as _header_at, scan_lines


def create_sparse_external_index(
    vcfc: bytes, index_path: str, config: SparseConfig | None = None
) -> None:
    config = config or SPARSE_EXTERNAL_INDEX_CONFIG
    with open(index_path, "wb") as f:
        for rec in scan_lines(vcfc):
            sparse_offset = config.compute_sparse_offset(rec.chrom, rec.pos)
            entry = IndexEntry(reference_to_int(rec.chrom), rec.pos, rec.offset)
            f.seek(sparse_offset)
            f.write(entry.pack())


def query_sparse_external_index(
    vcfc: bytes,
    index_path: str,
    query: CoordinateQuery,
    config: SparseConfig | None = None,
):
    """Yield decompressed matching lines (main.cpp:1002-1281)."""
    config = config or SPARSE_EXTERNAL_INDEX_CONFIG
    header = parse_metadata_headers(vcfc)
    sample_count = header.schema.sample_count
    block = config.block_size * config.multiplication_factor

    with open(index_path, "rb") as f, timing_probe("index_search"):
        fd = f.fileno()
        sparse_offset = config.compute_sparse_offset(
            query.reference_name, query.start_position
        )
        f.seek(sparse_offset)
        buf = f.read(ENTRY_SIZE)
        if len(buf) < ENTRY_SIZE:
            return
        entry = IndexEntry.unpack(buf)
        if entry.is_empty:
            if query.start_position == query.end_position:
                return  # exact variant absent (main.cpp:1097-1102)
            # brute-search ahead over holes in block_size steps
            pos = sparse_offset
            while True:
                try:
                    pos = os.lseek(fd, pos, os.SEEK_DATA)
                except OSError:
                    return
                f.seek(pos)
                buf = f.read(ENTRY_SIZE)
                if len(buf) < ENTRY_SIZE:
                    return
                entry = IndexEntry.unpack(buf)
                if entry.is_empty:
                    pos += block
                    continue
                break

    # seeking→iteration phase split as in the binned query (reference
    # main.cpp:1191-1276 uses the same state machine); hits decode in
    # batches through the native pipeline (query/bulk.py)
    from ..query.bulk import HitBuffer

    buf = HitBuffer(vcfc, header)
    probing = timing_enabled()
    t0 = time.perf_counter_ns() if probing else 0
    seeking = True
    try:
        h = _header_at(header, entry.byte_offset)
        for rec in scan_lines(vcfc, header=h):
            cmp = query.compare_to(rec.chrom.decode(), rec.pos)
            if cmp > 0:
                continue  # before query range
            if probing and seeking:
                now = time.perf_counter_ns()
                record("decompress_seeking", now - t0)
                t0, seeking = now, False
            if cmp == 0:
                yield from buf.add(rec)
            else:
                break
        yield from buf.flush()
    finally:
        if probing:
            record(
                "decompress_seeking" if seeking else "decompress_iteration",
                time.perf_counter_ns() - t0,
            )

