"""Canonical Huffman codec tests."""

import numpy as np
import pytest

from vcfc_tpu.ops.huffman import (
    MAX_CODE_LEN,
    Codebook,
    code_lengths,
    pack_symbols,
    unpack_symbols,
)


class TestCodeLengths:
    def test_two_symbols(self):
        lens = code_lengths(np.array([5, 3]))
        assert lens.tolist() == [1, 1]

    def test_single_symbol(self):
        lens = code_lengths(np.array([0, 7, 0]))
        assert lens.tolist() == [0, 1, 0]

    def test_kraft_inequality(self):
        rng = np.random.default_rng(0)
        freqs = rng.integers(0, 1000, size=300)
        lens = code_lengths(freqs)
        present = lens[freqs > 0]
        assert (present > 0).all()
        assert (lens[freqs == 0] == 0).all()
        assert sum(2.0 ** -int(l) for l in present) <= 1.0 + 1e-12
        assert present.max() <= MAX_CODE_LEN

    def test_skewed_distribution_length_limited(self):
        # exponentially skewed frequencies would exceed the cap unlimited
        freqs = np.array([2**i for i in range(40)], dtype=np.float64)
        lens = code_lengths(freqs)
        assert lens.max() <= MAX_CODE_LEN
        assert sum(2.0 ** -int(l) for l in lens[lens > 0]) <= 1.0 + 1e-12


class TestCanonical:
    def test_prefix_free(self):
        freqs = np.array([50, 30, 10, 5, 3, 2])
        book = Codebook.from_frequencies(freqs)
        words = [
            format(int(book.codes[s]), f"0{book.lengths[s]}b")
            for s in range(6)
        ]
        for i, a in enumerate(words):
            for j, b in enumerate(words):
                if i != j:
                    assert not b.startswith(a)

    def test_roundtrip_random(self):
        rng = np.random.default_rng(1)
        freqs = np.zeros(512, np.int64)
        used = rng.choice(512, size=40, replace=False)
        freqs[used] = rng.integers(1, 10_000, size=40)
        book = Codebook.from_frequencies(freqs)
        symbols = rng.choice(used, size=5_000, p=freqs[used] / freqs[used].sum())
        payload, total_bits = pack_symbols(symbols, book)
        assert len(payload) == (total_bits + 7) // 8
        out = unpack_symbols(payload, len(symbols), book)
        np.testing.assert_array_equal(out, symbols)

    def test_compression_beats_raw(self):
        # heavily skewed stream should compress well below 8 bits/symbol
        rng = np.random.default_rng(2)
        symbols = rng.choice(4, size=10_000, p=[0.85, 0.1, 0.04, 0.01])
        freqs = np.bincount(symbols, minlength=256)
        book = Codebook.from_frequencies(freqs)
        payload, bits = pack_symbols(symbols, book)
        assert bits / len(symbols) < 2.0
