"""Native-accelerated host paths (thread-parallel C++ via ctypes).

Mirrors host/assemble.py's interfaces; used by the engine when
``native.available()``.  Irregular/escape lines are spliced by the oracle
codec exactly as in the numpy path — the native library handles the
regular fast path only.
"""

from __future__ import annotations

import numpy as np

from ..format.lines import decode_data_line, encode_data_line
from ..format.vcf import parse_metadata_headers
from . import native
from .assemble import ParsedVcfc
from .parse import ParsedVcf


def assemble_vcfc_native(
    parsed: ParsedVcf,
    flags: np.ndarray,
    seg_start: np.ndarray,
    nseg: np.ndarray,
) -> bytes:
    L, S = parsed.n_lines, parsed.n_samples
    header_blob = b"".join(parsed.header.meta_lines) + parsed.header.header_line

    irregular = parsed.irregular.astype(np.uint8)
    sizes = np.zeros(L, np.int64)
    oracle_lines: dict[int, bytes] = {}
    for i in np.flatnonzero(parsed.irregular):
        enc = encode_data_line(parsed.line_text(int(i)), add_newline=True)
        oracle_lines[int(i)] = enc
        sizes[i] = len(enc)

    native.measure(
        parsed.data, parsed.line_start, parsed.sample_start, flags, nseg,
        irregular, S, sizes,
    )
    out_off = np.empty(L, np.int64)
    base = len(header_blob)
    np.cumsum(sizes[:-1], out=out_off[1:]) if L > 1 else None
    out_off[0] = 0
    out_off += base
    total = base + int(sizes.sum())

    out = np.empty(total, np.uint8)
    out[:base] = np.frombuffer(header_blob, np.uint8)
    native.write(
        parsed.data, parsed.line_start, parsed.sample_start, flags, seg_start,
        nseg, irregular, out_off, sizes, S, out,
    )
    for i, enc in oracle_lines.items():
        out[out_off[i] : out_off[i] + len(enc)] = np.frombuffer(enc, np.uint8)
    return out.tobytes()


def parse_vcfc_native(raw: bytes, flag_width_hint: int = 0) -> ParsedVcfc:
    header = parse_metadata_headers(raw)
    raw_np = np.frombuffer(raw, np.uint8)
    # upper bound on line count: every line is >= 10 bytes
    max_lines = max((len(raw) - header.data_offset) // 10 + 2, 16)
    line_off, line_len, req_len = native.scan_vcfc(raw_np, header.data_offset, max_lines)
    L = len(line_off)
    if L == 0:
        return ParsedVcfc(
            header, raw, line_off, line_len, req_len,
            np.zeros((0, 0), np.uint8), np.zeros(0, np.int32), np.zeros(0, bool),
        )
    width = int((line_len - 5 - req_len).max())
    width = max(width, flag_width_hint, 1)
    flags, nflags = native.extract_flags(raw_np, line_off, line_len, req_len, width)
    escape_line = nflags < 0
    nflags = np.where(escape_line, 0, nflags).astype(np.int32)
    return ParsedVcfc(
        header, raw, line_off, line_len, req_len, flags, nflags, escape_line
    )


def assemble_vcf_native(
    parsed: ParsedVcfc,
    text: np.ndarray,  # (L, TW) rendered sample text, TW >= 4*S
    decoded: np.ndarray,
) -> bytes:
    from ..format.lines import VcfValidationError

    S = parsed.header.schema.sample_count
    L = parsed.n_lines
    header_blob = b"".join(parsed.header.meta_lines) + parsed.header.header_line
    base = len(header_blob)

    bad = (~parsed.escape_line) & (decoded != S)
    if bad.any():
        i = int(np.flatnonzero(bad)[0])
        raise VcfValidationError(
            f"line {i}: decoded {int(decoded[i])} samples, expected {S}"
        )

    sizes = np.where(
        parsed.escape_line, 0, parsed.required_length.astype(np.int64) + 4 * S
    )
    oracle_lines: dict[int, bytes] = {}
    for i in np.flatnonzero(parsed.escape_line):
        line, _ = decode_data_line(parsed.raw, int(parsed.line_offset[i]), S)
        oracle_lines[int(i)] = line
        sizes[i] = len(line)

    out_off = np.empty(L, np.int64)
    out_off[0] = 0
    if L > 1:
        np.cumsum(sizes[:-1], out=out_off[1:])
    out_off += base
    total = base + int(sizes.sum())

    out = np.empty(total, np.uint8)
    out[:base] = np.frombuffer(header_blob, np.uint8)
    native.render(
        np.frombuffer(parsed.raw, np.uint8), parsed.line_offset,
        parsed.required_length, text, parsed.escape_line.astype(np.uint8),
        out_off, S, out,
    )
    for i, line in oracle_lines.items():
        out[out_off[i] : out_off[i] + len(line)] = np.frombuffer(line, np.uint8)
    return out.tobytes()
