"""Host-side assembly: device kernel outputs <-> final byte streams.

Encode direction: takes the packed flag bytes produced by
``vcfc_tpu.ops.rle.rle_encode`` and splices them with the verbatim
required-column blobs and escape-string side channel into the exact
.vcfc byte stream (layout per compress.cpp:5-203).

Decode direction: walks a .vcfc stream, separates flag bytes from inline
escape ASCII, feeds dense flag matrices to ``rle_decode``, and splices
rendered sample text back into VCF lines.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..format.constants import SAMPLE_MASK_UNCOMPRESSED, SAMPLE_MASKED_UNCOMPRESSED
from ..format.headers import decode_line_headers, encode_length_header
from ..format.lines import decode_data_line, encode_data_line
from ..format.vcf import VcfcHeader, parse_metadata_headers
from .parse import ParsedVcf

_ESC = SAMPLE_MASKED_UNCOMPRESSED


def assemble_vcfc(
    parsed: ParsedVcf,
    flags: np.ndarray,  # (L, S_pad) uint8 packed flag bytes
    seg_start: np.ndarray,  # (L, S_pad) int32 sample index per segment
    nseg: np.ndarray,  # (L,) int32
) -> bytes:
    """Merge device-encoded flag bytes with host blobs into .vcfc bytes."""
    out = bytearray()
    for line in parsed.header.meta_lines:
        out += line
    out += parsed.header.header_line

    S = parsed.n_samples
    esc_flag = np.uint8(_ESC | 1)
    for i in range(parsed.n_lines):
        if parsed.irregular[i]:
            # arbitrary-width sample fields: oracle path
            out += encode_data_line(parsed.line_text(i), add_newline=True)
            continue
        n = int(nseg[i])
        row = flags[i, :n]
        blob = parsed.required_blob(i)
        req_len = len(blob)
        has_escape = bool((row & SAMPLE_MASK_UNCOMPRESSED == _ESC).any())
        if not has_escape:
            body = row.tobytes()
        else:
            pieces = []
            starts = seg_start[i, :n]
            for k in range(n):
                b = int(row[k])
                pieces.append(row[k : k + 1].tobytes())
                if (b & SAMPLE_MASK_UNCOMPRESSED) == _ESC:
                    j = int(starts[k])
                    pieces.append(parsed.sample_field(i, j))
                    if j < S - 1:
                        pieces.append(b"\t")
            body = b"".join(pieces)
        line_length = 4 + req_len + len(body) + 1
        out += encode_length_header(line_length)
        out += encode_length_header(req_len)
        out += blob
        out += body
        out += b"\n"
    return bytes(out)


@dataclass
class ParsedVcfc:
    """A .vcfc stream decomposed for the device decode path."""

    header: VcfcHeader
    raw: bytes
    line_offset: np.ndarray  # (L,) int64 — absolute offset of each data line
    line_length: np.ndarray  # (L,) int32 — header #1 value
    required_length: np.ndarray  # (L,) int32 — header #2 value
    flags: np.ndarray  # (L, M) uint8 — packed flag bytes (escape-free lines)
    nflags: np.ndarray  # (L,) int32
    escape_line: np.ndarray  # (L,) bool — lines containing escape columns

    @property
    def n_lines(self) -> int:
        return len(self.line_offset)

    def required_blob(self, i: int) -> bytes:
        off = int(self.line_offset[i]) + 8
        return self.raw[off : off + int(self.required_length[i])]


def parse_vcfc_bytes(raw: bytes) -> ParsedVcfc:
    """Walk a .vcfc stream and extract dense flag matrices.

    Escape-free lines (the overwhelming majority in cohort data) become rows
    of a dense (L, M) flag matrix for the device decoder.  Lines containing
    escape bytes (>= 0xE0) keep ragged inline ASCII and are decoded by the
    oracle in ``decompress_vcfc``.
    """
    header = parse_metadata_headers(raw)
    offsets, lengths, req_lengths, flag_rows, escs = [], [], [], [], []
    offset = header.data_offset
    n = len(raw)
    while offset < n:
        line_length, required_length = decode_line_headers(raw, offset)
        offsets.append(offset)
        lengths.append(line_length)
        req_lengths.append(required_length)
        body = np.frombuffer(
            raw,
            np.uint8,
            count=line_length - 4 - required_length - 1,
            offset=offset + 8 + required_length,
        )
        is_esc = bool((body >= _ESC).any())
        escs.append(is_esc)
        flag_rows.append(None if is_esc else body)
        offset += 4 + line_length

    L = len(offsets)
    M = max((len(r) for r in flag_rows if r is not None), default=0)
    flags = np.zeros((L, M), np.uint8)
    nflags = np.zeros(L, np.int32)
    for i, r in enumerate(flag_rows):
        if r is not None:
            flags[i, : len(r)] = r
            nflags[i] = len(r)
    return ParsedVcfc(
        header,
        raw,
        np.array(offsets, np.int64),
        np.array(lengths, np.int32),
        np.array(req_lengths, np.int32),
        flags,
        nflags,
        np.array(escs, bool),
    )


def assemble_vcf(
    parsed: ParsedVcfc,
    text: np.ndarray,  # (L, S*4) uint8 rendered sample text from rle_decode
    decoded: np.ndarray,  # (L,) int32 samples produced per line
) -> bytes:
    """Merge rendered sample text with required blobs into VCF bytes."""
    from ..format.lines import VcfValidationError

    S = parsed.header.schema.sample_count
    out = bytearray()
    for line in parsed.header.meta_lines:
        out += line
    out += parsed.header.header_line

    for i in range(parsed.n_lines):
        if parsed.escape_line[i]:
            line, _ = decode_data_line(
                parsed.raw, int(parsed.line_offset[i]), S
            )
            out += line
            continue
        if int(decoded[i]) != S:
            raise VcfValidationError(
                f"line {i}: decoded {int(decoded[i])} samples, expected {S}"
            )
        out += parsed.required_blob(i)
        out += text[i, : 4 * S - 1].tobytes()  # drop the trailing tab
        out += b"\n"
    return bytes(out)
