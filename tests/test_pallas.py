"""Fused Pallas kernels must match the XLA kernels bit-for-bit.

Runs in interpret mode on the CPU suite; compiled-mode equality is
covered by the TPU benchmarks (which assert equality on-device)."""

import numpy as np
import pytest

from vcfc_tpu.ops.pallas_rle import (
    MAX_WIDTH,
    _block_l,
    pallas_rle_decode,
    pallas_rle_encode,
    pallas_text_decode,
    pallas_text_encode,
)
from vcfc_tpu.ops.rle import (
    rle_decode,
    rle_encode,
    text_rle_decode,
    text_rle_encode,
)

BL = 256  # tile height at narrow widths; wider tiles shrink (_block_l)


@pytest.mark.parametrize("seed,S", [(0, 300), (1, 384), (2, 127)])
def test_pallas_encode_matches_xla(seed, S):
    rng = np.random.default_rng(seed)
    codes = rng.choice(5, size=(BL, 384), p=[0.7, 0.1, 0.1, 0.05, 0.05]).astype(
        np.uint8
    )
    codes[:, S:] = 0
    f1, k1 = map(np.asarray, rle_encode(codes, S))
    f2, k2 = map(np.asarray, pallas_rle_encode(codes, S, interpret=True))
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(k1, k2)


def test_pallas_decode_matches_xla():
    rng = np.random.default_rng(3)
    S = 300
    codes = rng.choice(5, size=(BL, 384), p=[0.6, 0.15, 0.1, 0.1, 0.05]).astype(
        np.uint8
    )
    codes[:, S:] = 0
    flags, _ = map(np.asarray, rle_encode(codes, S))
    c1, d1 = map(np.asarray, rle_decode(flags, S))
    c2, d2 = map(np.asarray, pallas_rle_decode(flags, S, interpret=True))
    np.testing.assert_array_equal(c1[:, :S], c2[:, :S])
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(c2[:, :S], codes[:, :S])


def test_long_runs_cross_pallas_blocks():
    # all-0|0 rows: 127-cap splitting must be identical
    codes = np.zeros((BL, 384), np.uint8)
    f, k = map(np.asarray, pallas_rle_encode(codes, 300, interpret=True))
    assert np.flatnonzero(f[0]).tolist() == [126, 253, 299]
    assert (k == 3).all()


def test_cohort_width_uniform_runs():
    """Regression: the encode magic-number remainders must be VALUE-exact
    at realistic cohort widths.  ceil(2^16/31)=2115 (the old q31 magic)
    overshoots at d=2262 < 2504, emitting a malformed count-0 flag on a
    uniform non-0|0 row; ceil(2^21/31)=67651 is exact to 72,315."""
    S = 2504
    S_pad = 2560
    codes = np.zeros((BL, S_pad), np.uint8)
    for row, code in enumerate([0, 1, 2, 3]):
        codes[row, :S] = code
    f1, k1 = map(np.asarray, rle_encode(codes, S))
    f2, k2 = map(np.asarray, pallas_rle_encode(codes, S, interpret=True))
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(k1, k2)
    # decode inverts at full width too
    c1, d1 = map(np.asarray, rle_decode(f2, S))
    c2, d2 = map(np.asarray, pallas_rle_decode(f2, S, interpret=True))
    np.testing.assert_array_equal(c1[:, :S], c2[:, :S])
    np.testing.assert_array_equal(d1, d2)
    assert (d2 == S).all()
    np.testing.assert_array_equal(c2[:, :S], codes[:, :S])


class TestWideWidths:
    """Past S_pad=4096 the kernels switch to Mersenne digit-sum
    remainders and adaptive tile heights (VERDICT r2 #5: the fused
    kernels must cover wide cohorts, not fall back to XLA)."""

    @pytest.mark.parametrize("S,S_pad", [(4200, 4224), (16000, 16384)])
    def test_wide_uniform_runs_exact(self, S, S_pad):
        # uniform rows stress the remainder at maximal d = S-1
        bl = _block_l(S_pad)
        codes = np.zeros((bl, S_pad), np.uint8)
        for row in range(min(bl, 4)):
            codes[row, :S] = row  # codes 0..3
        f1, k1 = map(np.asarray, rle_encode(codes, S))
        f2, k2 = map(np.asarray, pallas_rle_encode(codes, S, interpret=True))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(k1, k2)
        c2, d2 = map(np.asarray, pallas_rle_decode(f2, S, interpret=True))
        np.testing.assert_array_equal(c2[:, :S], codes[:, :S])
        assert (d2 == S).all()

    def test_wide_random_roundtrip(self):
        S, S_pad = 8200, 8320
        bl = _block_l(S_pad)
        rng = np.random.default_rng(7)
        codes = np.zeros((bl * 2, S_pad), np.uint8)
        codes[:, :S] = rng.choice(
            5, size=(bl * 2, S), p=[0.81, 0.072, 0.072, 0.0264, 0.0196]
        )
        f1, k1 = map(np.asarray, rle_encode(codes, S))
        f2, k2 = map(np.asarray, pallas_rle_encode(codes, S, interpret=True))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(k1, k2)
        c2, d2 = map(np.asarray, pallas_rle_decode(f2, S, interpret=True))
        np.testing.assert_array_equal(c2[:, :S], codes[:, :S])
        assert (d2 == S).all()

    def test_block_l_adapts(self):
        assert _block_l(2560) == 256
        assert _block_l(4096) == 128
        assert _block_l(16384) == 32
        assert _block_l(MAX_WIDTH) == 8
        assert _block_l(2560, shrink=2) == 128

    def test_width_guard(self):
        codes = np.zeros((8, MAX_WIDTH + 128), np.uint8)
        with pytest.raises(ValueError, match="sample width"):
            pallas_rle_encode(codes, MAX_WIDTH, interpret=True)

    def test_mersenne_folds_exhaustive(self):
        """The digit-sum remainders must equal d % cap for EVERY d the
        kernels can see (d < 2^21 covers any S_pad <= MAX_WIDTH) — a
        single wrong remainder is a malformed flag byte.  numpy mirror
        of pallas_rle._rem_mod_caps' wide branch."""
        d = np.arange(1 << 21, dtype=np.int64)
        x = (d >> 14) + ((d >> 7) & 127) + (d & 127)
        x = (x >> 7) + (x & 127)
        r127 = np.where(x >= 127, x - 127, x)
        np.testing.assert_array_equal(r127, d % 127)
        y = (d >> 15) + ((d >> 10) & 31) + ((d >> 5) & 31) + (d & 31)
        y = (y >> 5) + (y & 31)
        r31 = np.where(y >= 31, y - 31, y)
        # the kernels bound d < S_pad <= 2^16 for the 31-cap path; the
        # fold is in fact exact to 2^20 (digits cover bits 0..19)
        np.testing.assert_array_equal(r31[: 1 << 20], d[: 1 << 20] % 31)


def _words(fields, last_newline=True):
    """ASCII 3-byte sample fields -> little-endian i32 "a|b<sep>" words."""
    L = len(fields)
    S = len(fields[0])
    out = np.zeros((L, S), np.int32)
    for i, row in enumerate(fields):
        for j, f in enumerate(row):
            sep = 10 if (last_newline and j == S - 1) else 9
            out[i, j] = f[0] | (f[1] << 8) | (f[2] << 16) | (sep << 24)
    return out


class TestTextKernels:
    """Fused ASCII classify+encode / decode+render (VERDICT r2 #1)."""

    FIELDS = [b"0|0", b"0|1", b"1|0", b"1|1", b"2|0", b"./.", b"0/1", b"9|9"]

    def _random_fields(self, L, S, seed):
        rng = np.random.default_rng(seed)
        pick = rng.choice(len(self.FIELDS), size=(L, S), p=[0.7, 0.08, 0.08, 0.06, 0.03, 0.03, 0.01, 0.01])
        return [[self.FIELDS[pick[i, j]] for j in range(S)] for i in range(L)]

    def _codes(self, fields):
        m = {b"0|0": 0, b"0|1": 1, b"1|0": 2, b"1|1": 3}
        return np.array(
            [[m.get(f, 4) for f in row] for row in fields], np.uint8
        )

    def test_xla_text_encode_matches_classify_then_encode(self):
        S, S_pad = 300, 384
        fields = self._random_fields(64, S, 11)
        text = np.zeros((64, S_pad), np.int32)
        text[:, :S] = _words(fields)
        codes = np.zeros((64, S_pad), np.uint8)
        codes[:, :S] = self._codes(fields)
        f1, k1 = map(np.asarray, rle_encode(codes, S))
        f2, k2, reg = map(np.asarray, text_rle_encode(text, S))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(k1, k2)
        assert (reg == 1).all()

    def test_bad_separator_flags_row(self):
        S = 8
        fields = [[b"0|0"] * S, [b"0|1"] * S]
        text = _words(fields)
        # corrupt a separator byte on row 1 (sample 2's 4th byte)
        text[1, 2] = (text[1, 2] & 0x00FFFFFF) | (ord("x") << 24)
        _f, _k, reg = map(np.asarray, text_rle_encode(text, S))
        assert reg.tolist() == [1, 0]

    def test_pallas_text_encode_matches_xla(self):
        S, S_pad = 290, 384
        fields = self._random_fields(BL, S, 12)
        text = np.zeros((BL, S_pad), np.int32)
        text[:, :S] = _words(fields)
        f1, k1, r1 = map(np.asarray, text_rle_encode(text, S))
        f2, k2, r2 = map(np.asarray, pallas_text_encode(text, S, interpret=True))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(r1, r2)

    def test_text_decode_renders_words(self):
        S, S_pad = 300, 384
        fields = self._random_fields(64, S, 13)
        codes = np.zeros((64, S_pad), np.uint8)
        codes[:, :S] = self._codes(fields)
        flags, _ = map(np.asarray, rle_encode(codes, S))
        t1, c1, d1 = map(np.asarray, text_rle_decode(flags, S))
        # every non-escape word matches the source ASCII; escapes render ?|?
        want = _words(
            [
                [f if f in (b"0|0", b"0|1", b"1|0", b"1|1") else b"?|?" for f in row]
                for row in fields
            ]
        )
        np.testing.assert_array_equal(t1[:, :S], want)
        np.testing.assert_array_equal(c1[:, :S], codes[:, :S])
        assert (d1 == S).all()

    def test_pallas_text_decode_matches_xla(self):
        S, S_pad = 290, 384
        fields = self._random_fields(BL, S, 14)
        codes = np.zeros((BL, S_pad), np.uint8)
        codes[:, :S] = self._codes(fields)
        flags, _ = map(np.asarray, rle_encode(codes, S))
        t1, c1, d1 = map(np.asarray, text_rle_decode(flags, S))
        t2, c2, d2 = map(np.asarray, pallas_text_decode(flags, S, interpret=True))
        np.testing.assert_array_equal(t1[:, :S], t2[:, :S])
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(d1, d2)

    def test_text_roundtrip_fixed_point(self):
        """decode(encode(text)) == rendered text, and a second pass is
        the identity — the property the bench loop relies on."""
        S, S_pad = 300, 384
        fields = self._random_fields(64, S, 15)
        text = np.zeros((64, S_pad), np.int32)
        text[:, :S] = _words(fields)
        f, _k, _r = text_rle_encode(text, S)
        t1, _c, _d = text_rle_decode(np.asarray(f), S)
        f2, _k2, _r2 = text_rle_encode(np.asarray(t1), S)
        t2, _c2, _d2 = text_rle_decode(np.asarray(f2), S)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestMultiTileGrids:
    """VERDICT r3 #6: kernel equality where the GRID has multiple tiles
    on the line axis at wide widths — including the MAX_WIDTH boundary
    (8-row tiles) — and escape-heavy wide rows."""

    def _check(self, codes, S):
        f1, k1 = map(np.asarray, rle_encode(codes, S))
        f2, k2 = map(np.asarray, pallas_rle_encode(codes, S, interpret=True))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(k1, k2)
        c2, d2 = map(np.asarray, pallas_rle_decode(f2, S, interpret=True))
        np.testing.assert_array_equal(c2[:, :S], np.asarray(codes)[:, :S])
        assert (d2 == S).all()

    def test_three_tiles_at_16384(self):
        S, S_pad = 16300, 16384
        bl = _block_l(S_pad)
        L = 3 * bl  # three grid tiles on the line axis
        rng = np.random.default_rng(21)
        codes = np.zeros((L, S_pad), np.uint8)
        codes[:, :S] = rng.choice(
            5, size=(L, S), p=[0.81, 0.072, 0.072, 0.0264, 0.0196]
        )
        codes[bl, :S] = 0      # tile-boundary rows with maximal runs
        codes[2 * bl - 1, :S] = 3
        self._check(codes, S)

    def test_three_tiles_at_max_width(self):
        S = MAX_WIDTH - 60  # pads to the 65,536 boundary, 8-row tiles
        bl = _block_l(MAX_WIDTH)
        L = 3 * bl
        rng = np.random.default_rng(22)
        codes = np.zeros((L, MAX_WIDTH), np.uint8)
        codes[:, :S] = rng.choice(
            5, size=(L, S), p=[0.81, 0.072, 0.072, 0.0264, 0.0196]
        )
        codes[0, :S] = 1  # uniform het row: remainder stress at max d
        self._check(codes, S)

    def test_escape_heavy_wide_rows(self):
        """Rows that are mostly escapes force a flag byte per cell — the
        densest positional plane the encoder can produce at width."""
        S, S_pad = 16300, 16384
        bl = _block_l(S_pad)
        L = 2 * bl
        rng = np.random.default_rng(23)
        codes = np.zeros((L, S_pad), np.uint8)
        codes[:, :S] = rng.choice(5, size=(L, S), p=[0.1, 0.05, 0.05, 0.05, 0.75])
        self._check(codes, S)
