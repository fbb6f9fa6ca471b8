"""Canonical, length-limited Huffman coding over codec symbols.

The .vcfz extended container entropy-codes the per-line symbol stream
(flag bytes plus dictionary-coded escape strings) with one *global*
codebook.  Histograms come from the device (ops.histogram /
parallel.shard psum-merge); the tiny tree construction is host work.

Canonical form: codebook is fully determined by the per-symbol code
lengths, so the container stores just one byte per present symbol.
Lengths are limited to MAX_CODE_LEN so decode can use a flat
2^MAX_CODE_LEN lookup table (the native decoder) — lengths beyond the
cap are squashed with the standard count-scaling heuristic.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

MAX_CODE_LEN = 15


def code_lengths(freqs: np.ndarray) -> np.ndarray:
    """Huffman code lengths for a frequency vector (0 for absent symbols),
    limited to MAX_CODE_LEN."""
    freqs = np.asarray(freqs, np.int64)
    present = np.flatnonzero(freqs > 0)
    n = len(present)
    lengths = np.zeros(len(freqs), np.uint8)
    if n == 0:
        return lengths
    if n == 1:
        lengths[present[0]] = 1
        return lengths

    f = freqs[present].astype(np.float64)
    for _ in range(32):  # squash until the tree fits the cap
        heap: list[tuple[float, int]] = [(float(w), i) for i, w in enumerate(f)]
        heapq.heapify(heap)
        parent = {}
        next_id = n
        while len(heap) > 1:
            w1, a = heapq.heappop(heap)
            w2, b = heapq.heappop(heap)
            parent[a] = next_id
            parent[b] = next_id
            heapq.heappush(heap, (w1 + w2, next_id))
            next_id += 1
        depth = np.zeros(n, np.int32)
        for i in range(n):
            d, node = 0, i
            while node in parent:
                node = parent[node]
                d += 1
            depth[i] = d
        if depth.max() <= MAX_CODE_LEN:
            lengths[present] = depth.astype(np.uint8)
            return lengths
        # flatten the distribution and retry (standard length-limit trick)
        f = np.maximum(f // 2, 1) if f.dtype.kind == "i" else np.maximum(f / 2, 1.0)
    raise RuntimeError("failed to limit Huffman code lengths")


@dataclass
class Codebook:
    """Canonical codebook: codes assigned in (length, symbol) order."""

    lengths: np.ndarray  # (n_symbols,) uint8, 0 = absent
    codes: np.ndarray  # (n_symbols,) uint32

    @classmethod
    def from_lengths(cls, lengths: np.ndarray) -> "Codebook":
        lengths = np.asarray(lengths, np.uint8)
        codes = np.zeros(len(lengths), np.uint32)
        code = 0
        for bit_len in range(1, MAX_CODE_LEN + 1):
            for sym in np.flatnonzero(lengths == bit_len):
                codes[sym] = code
                code += 1
            code <<= 1
        return cls(lengths, codes)

    @classmethod
    def from_frequencies(cls, freqs: np.ndarray) -> "Codebook":
        return cls.from_lengths(code_lengths(freqs))

    def decode_table(self) -> tuple[np.ndarray, np.ndarray]:
        """Flat 2^MAX_CODE_LEN decode table: (symbol, length) per prefix."""
        size = 1 << MAX_CODE_LEN
        sym_t = np.zeros(size, np.int32)
        len_t = np.zeros(size, np.uint8)
        for sym in np.flatnonzero(self.lengths):
            ln = int(self.lengths[sym])
            prefix = int(self.codes[sym]) << (MAX_CODE_LEN - ln)
            count = 1 << (MAX_CODE_LEN - ln)
            sym_t[prefix : prefix + count] = sym
            len_t[prefix : prefix + count] = ln
        return sym_t, len_t


def pack_symbols(symbols: np.ndarray, book: Codebook) -> tuple[bytes, int]:
    """Vectorized MSB-first bit packing. Returns (payload, total_bits)."""
    lengths = book.lengths[symbols].astype(np.int64)
    if (lengths == 0).any():
        raise ValueError("symbol with no codeword in the codebook")
    codes = book.codes[symbols].astype(np.uint64)
    total = int(lengths.sum())
    # expand every symbol to its bits: bit k of an n-bit code is
    # (code >> (n-1-k)) & 1
    ends = np.cumsum(lengths)
    starts = ends - lengths
    bit_sym = np.repeat(np.arange(len(symbols)), lengths)
    bit_k = np.arange(total) - np.repeat(starts, lengths)
    shift = (lengths[bit_sym] - 1 - bit_k).astype(np.uint64)
    bits = ((codes[bit_sym] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes(), total


def unpack_symbols(payload: bytes, n_symbols: int, book: Codebook) -> np.ndarray:
    """Pure-Python/numpy canonical decode (oracle; the native decoder is
    the fast path)."""
    sym_t, len_t = book.decode_table()
    bits = np.unpackbits(np.frombuffer(payload, np.uint8))
    out = np.empty(n_symbols, np.int32)
    pos = 0
    window = MAX_CODE_LEN
    # build a padded bit array so the final window read never overruns
    padded = np.concatenate([bits, np.zeros(window, np.uint8)])
    weights = (1 << np.arange(window - 1, -1, -1)).astype(np.int64)
    for i in range(n_symbols):
        prefix = int(padded[pos : pos + window] @ weights)
        out[i] = sym_t[prefix]
        pos += int(len_t[prefix])
    return out
