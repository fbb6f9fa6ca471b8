"""Wide-cohort scaling (VERDICT r1 #5 / r2 #5): biobank-scale sample
widths must stay byte-identical to the oracle, with the adaptive line
batch bounding device memory.  Since r3 the fused Pallas kernels cover
widths to MAX_WIDTH=65536 (Mersenne remainders + adaptive tile
heights; the 2x-wider text kernels to 49152 — max_fused_width(2));
only wider cohorts route to XLA."""

import numpy as np
import pytest

from test_fuzz import make_vcf

from vcfc_tpu import engine
from vcfc_tpu.format import compress_bytes


class TestAdaptiveLineBatch:
    def test_narrow_keeps_full_batch(self):
        assert engine._adaptive_line_batch(2048, 2560) == 2048

    def test_wide_shrinks_to_cell_cap(self):
        lb = engine._adaptive_line_batch(2048, 50048)
        assert lb % 256 == 0
        assert lb * 50048 <= engine._TARGET_BATCH_CELLS
        assert lb >= 256

    def test_extreme_width_floors_at_256(self):
        assert engine._adaptive_line_batch(2048, 1 << 20) == 256

    def test_width_routing_policy(self, monkeypatch):
        """r3: fused kernels now cover wide cohorts (Mersenne remainders
        + adaptive tile heights); only absurd widths route to XLA."""
        from vcfc_tpu.ops.pallas_rle import MAX_WIDTH
        from vcfc_tpu.ops.rle import rle_decode, rle_encode

        monkeypatch.setenv("VCFC_KERNEL", "pallas")
        assert engine._use_pallas(16384)
        assert engine._use_pallas(MAX_WIDTH)
        assert not engine._use_pallas(MAX_WIDTH + 128)
        monkeypatch.setenv("VCFC_KERNEL", "xla")
        assert engine._kernels(16384) == (rle_encode, rle_decode)

    def test_text_kernel_width_gate(self, monkeypatch):
        """ADVICE r3: the text kernels' i32 tiles are 2x the u8 ones, so
        their fused-width bound halves; beyond it the 8-row tile floor
        would overrun the scoped-VMEM budget."""
        from vcfc_tpu.ops.pallas_rle import _block_l, max_fused_width

        assert max_fused_width(2) == 49152
        monkeypatch.setenv("VCFC_KERNEL", "pallas")
        assert engine._use_pallas(max_fused_width(2), shrink=2)
        assert not engine._use_pallas(max_fused_width(2) + 128, shrink=2)
        assert _block_l(max_fused_width(2), shrink=2) == 8
        with pytest.raises(ValueError, match="VMEM budget"):
            _block_l(max_fused_width(2) + 128, shrink=2)


class TestWideCohorts:
    @pytest.mark.parametrize("samples,variants", [(16384, 24), (50000, 8)])
    def test_byte_identical_and_lossless(self, samples, variants):
        vcf = make_vcf(500 + samples, samples, variants, sv_every=7)
        want = compress_bytes(vcf)
        got = engine.compress(vcf, force_device=True)
        assert got == want, f"device compress diverged at S={samples}"
        back = engine.decompress(got, force_device=True)
        assert back == vcf, f"device decompress not lossless at S={samples}"

    def test_wide_unpack_kernel(self):
        """The MXU unpack holds at wide widths too (M far below S_pad)."""
        from vcfc_tpu.ops.rle import rle_encode, unpack_packed_flags

        rng = np.random.default_rng(3)
        L, S = 32, 16384
        codes = np.zeros((L, S), np.uint8)
        codes[:, :S] = rng.choice(5, size=(L, S), p=[0.9, 0.04, 0.03, 0.02, 0.01])
        flagpos, nseg = map(np.asarray, rle_encode(codes, S))
        M = int(nseg.max())
        packed = np.zeros((L, M), np.uint8)
        for i in range(L):
            nz = flagpos[i][flagpos[i] > 0]
            packed[i, : len(nz)] = nz
        got = np.asarray(unpack_packed_flags(packed, nseg, out_width=S))
        np.testing.assert_array_equal(got, flagpos)


class TestMultiTileWide:
    """VERDICT r3 #6: wide widths with enough LINES to span multiple
    device tile grids, the MAX_WIDTH padding boundary, and escape-heavy
    wide rows — all byte-identical to the oracle and lossless.  (The
    real-chip twins of these shapes are the BASELINE.md wide-cohort
    rows; interpret-mode kernel equality lives in test_pallas.py.)"""

    @pytest.mark.parametrize("samples,variants", [(16384, 260), (50000, 256)])
    def test_multi_tile_byte_identity(self, samples, variants):
        vcf = make_vcf(900 + samples % 97, samples, variants, sv_every=7)
        want = compress_bytes(vcf)
        got = engine.compress(vcf, force_device=True)
        assert got == want, f"multi-tile device compress diverged at S={samples}"
        assert engine.decompress(got, force_device=True) == vcf

    def test_max_width_padding_boundary(self):
        """S chosen so the padded width lands EXACTLY on MAX_WIDTH=65536
        (the widest the fused kernels accept; wider routes to XLA)."""
        from vcfc_tpu.ops.pallas_rle import MAX_WIDTH

        S = MAX_WIDTH - 100  # pads to 65,536 exactly
        assert (S + 127) // 128 * 128 == MAX_WIDTH
        vcf = make_vcf(911, S, 10, sv_every=5)
        want = compress_bytes(vcf)
        got = engine.compress(vcf, force_device=True)
        assert got == want
        assert engine.decompress(got, force_device=True) == vcf

    def test_escape_heavy_wide(self):
        """Wide rows where most cells escape (multi-allelic "2|0"-style
        GTs): the escape side channel and the 0xE1 new-run forcing must
        hold at width, not just at the narrow fixture scale."""
        rng = np.random.default_rng(12)
        S, L = 16384, 24
        gts = np.array([b"2|0", b"0|3", b"2|2", b"0|0", b"1|1"], dtype=object)
        rows = [
            b"##fileformat=VCFv4.2\n",
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
            + b"".join(b"\tS%d" % j for j in range(S))
            + b"\n",
        ]
        for i in range(L):
            rows.append(
                b"1\t%d\tv%d\tA\tG,T,C\t50\tPASS\t.\tGT\t" % (1000 + 7 * i, i)
                + b"\t".join(
                    rng.choice(gts, p=[0.4, 0.3, 0.1, 0.15, 0.05], size=S)
                )
                + b"\n"
            )
        vcf = b"".join(rows)
        want = compress_bytes(vcf)
        got = engine.compress(vcf, force_device=True)
        assert got == want
        assert engine.decompress(got, force_device=True) == vcf
