"""Query engines over .vcfc streams.

Full-scan query (query_compressed_file, main.cpp:3777-3929): walk every
line, parse CHROM/POS from the uncompressed region, decode matches.
Point-match semantics (query.matches) — no SV-aware end positions, unlike
the binned-index query.  gap_analysis (main.cpp:3931-3980) decodes every
line and reports (POS, decoded size, compressed size) triples.
"""

from __future__ import annotations

from ..format.lines import decode_data_line
from ..format.vcf import parse_metadata_headers
from ..index.scan import scan_lines
from .coordinate import CoordinateQuery


def query_full_scan(vcfc: bytes, query: CoordinateQuery):
    """Yield decompressed lines whose (CHROM, POS) match the query.
    Hits decode in batches through the native pipeline (query/bulk.py)."""
    from .bulk import HitBuffer

    header = parse_metadata_headers(vcfc)
    buf = HitBuffer(vcfc, header)
    for rec in scan_lines(vcfc, header=header):
        if query.matches(rec.chrom.decode(), rec.pos):
            yield from buf.add(rec)
    yield from buf.flush()


def gap_analysis(vcfc: bytes):
    """Yield (pos_str, decompressed_size, compressed_size) per line, the
    contents of the reference's start-positions.txt."""
    header = parse_metadata_headers(vcfc)
    sample_count = header.schema.sample_count
    offset = header.data_offset
    while offset < len(vcfc):
        line, consumed = decode_data_line(vcfc, offset, sample_count)
        pos = line.split(b"\t", 2)[1]
        # The reference's line_byte_count normally excludes the trailing
        # newline — EXCEPT when the line's final sample is an escape
        # column, whose scan reads (and counts) the newline before seeking
        # back (compress.cpp:869-892).  A final sample produced by a flag
        # byte is always one of the four GT literals; anything else came
        # through the escape path.
        last = line[:-1].rsplit(b"\t", 1)[-1]
        esc_end = sample_count > 0 and last not in (b"0|0", b"0|1", b"1|0", b"1|1")
        yield pos, len(line), consumed - (0 if esc_end else 1)
        offset += consumed
