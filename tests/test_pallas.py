"""Fused Pallas kernels must match the XLA kernels bit-for-bit.

Runs in interpret mode on the CPU suite; compiled-mode equality is
covered by the TPU benchmarks (which assert equality on-device)."""

import numpy as np
import pytest

from vcfc_tpu.ops.pallas_rle import BLOCK_L, pallas_rle_decode, pallas_rle_encode
from vcfc_tpu.ops.rle import rle_decode, rle_encode


@pytest.mark.parametrize("seed,S", [(0, 300), (1, 384), (2, 127)])
def test_pallas_encode_matches_xla(seed, S):
    rng = np.random.default_rng(seed)
    codes = rng.choice(5, size=(BLOCK_L, 384), p=[0.7, 0.1, 0.1, 0.05, 0.05]).astype(
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
    codes = rng.choice(5, size=(BLOCK_L, 384), p=[0.6, 0.15, 0.1, 0.1, 0.05]).astype(
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
    codes = np.zeros((BLOCK_L, 384), np.uint8)
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
    codes = np.zeros((BLOCK_L, S_pad), np.uint8)
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


def test_width_guard():
    codes = np.zeros((BLOCK_L, 4224), np.uint8)
    with pytest.raises(ValueError, match="sample width"):
        pallas_rle_encode(codes, 4200, interpret=True)
