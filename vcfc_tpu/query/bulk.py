"""Batched decode of matched query lines.

The query engines yield decompressed lines; decoding hits one line at a
time through the Python oracle costs ~0.4 ms per 2,504-sample line —
a 2,500-line range query spends ~1 s there.  This helper stitches the
matched compressed lines into a mini .vcfc (header + hit bytes — lines
are self-contained, compress.cpp:5) and runs the native thread-parallel
host pipeline over the whole batch, byte-identical to the per-line
oracle (the engine's host-executor decode path, verified in tests).
"""

from __future__ import annotations

import numpy as np

from ..format.lines import decode_data_line
from ..format.vcf import VcfcHeader
from ..host import native

# Below this many buffered hits the native pipeline's fixed costs beat
# nothing; decode per-line.  Also the flush granularity of the engines.
BULK_MIN = 48
BULK_CHUNK = 1024


def decode_hit_blobs(
    header_blob: bytes, header: VcfcHeader, blobs: list[bytes]
) -> list[bytes]:
    """Decode raw compressed-line byte blobs into text lines (with
    newlines) — the core batch path; blobs include their 8-byte length
    headers (self-contained lines, compress.cpp:5)."""
    S = header.schema.sample_count
    if not native.available() or len(blobs) < BULK_MIN:
        return [decode_data_line(b, 0, S)[0] for b in blobs]
    from ..host.fast import assemble_vcf_native, parse_vcfc_native
    from ..utils.timing import suspended

    with suspended():  # internal re-parse must not inflate TIMING labels
        parsed = parse_vcfc_native(header_blob + b"".join(blobs))
    codes = native.expand_codes(parsed.flags, S)
    # real per-line run-length sums, so assemble_vcf_native's
    # ``decoded != S`` check still fires on flag runs that don't cover
    # the sample grid (ADVICE r3: a constant S would mask corrupt input
    # the <BULK_MIN per-line path rejects)
    f = parsed.flags.astype(np.int32)
    run_len = np.where(
        (f & 0x80) == 0, f & 0x7F, np.where((f & 0xE0) == 0xE0, 1, f & 0x1F)
    )
    decoded = run_len.sum(axis=1, dtype=np.int64).astype(np.int32)
    text = assemble_vcf_native(parsed, codes, decoded)[len(header_blob) :]
    lines = [l + b"\n" for l in text.split(b"\n")[:-1]]
    if len(lines) != len(blobs):  # pragma: no cover - defensive
        return [decode_data_line(b, 0, S)[0] for b in blobs]
    return lines


def decode_hit_lines(vcfc: bytes, header: VcfcHeader, recs: list) -> list[bytes]:
    """Decode matched LineRecords into text lines (with newlines)."""
    S = header.schema.sample_count
    if not native.available() or len(recs) < BULK_MIN:
        return [decode_data_line(vcfc, r.offset, S)[0] for r in recs]
    return decode_hit_blobs(
        vcfc[: header.data_offset],
        header,
        [vcfc[r.offset : r.offset + 4 + r.line_length] for r in recs],
    )


class HitBuffer:
    """Accumulate matched records, flush decoded lines in batches while
    preserving yield order.  The FIRST flush triggers at BULK_MIN so a
    streaming consumer (CLI piped to head, next() on the generator) sees
    its first line quickly; later flushes use the full BULK_CHUNK."""

    def __init__(self, vcfc: bytes, header: VcfcHeader):
        self.vcfc = vcfc
        self.header = header
        self.pending: list = []
        self._threshold = BULK_MIN

    def add(self, rec) -> list[bytes]:
        self.pending.append(rec)
        if len(self.pending) >= self._threshold:
            return self.flush()
        return []

    def flush(self) -> list[bytes]:
        if not self.pending:
            return []
        lines = decode_hit_lines(self.vcfc, self.header, self.pending)
        self.pending = []
        self._threshold = BULK_CHUNK
        return lines
