"""VCFC_PARSE=device routes (VERDICT r2 #1): ASCII classification and
rendering move onto the device (fused text kernels); the engine output
must stay byte-identical to the format oracle, including escapes,
irregular lines, and run caps."""

import numpy as np
import pytest

from test_fuzz import make_vcf

from vcfc_tpu import engine
from vcfc_tpu.format import compress_bytes, decompress_bytes
from vcfc_tpu.host import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="device-parse routes require the native runtime"
)


@pytest.fixture
def device_parse(monkeypatch):
    monkeypatch.setenv("VCFC_PARSE", "device")


class TestDeviceParseCompress:
    @pytest.mark.parametrize("seed,samples", [(201, 127), (202, 300), (203, 2504)])
    def test_byte_identical(self, device_parse, seed, samples):
        vcf = make_vcf(seed, samples, 24, sv_every=5)
        assert engine.compress(vcf, force_device=True) == compress_bytes(vcf)

    def test_irregular_lines_route_to_oracle(self, device_parse):
        """Wide escape fields ("10|2") break the 4-byte stride: those
        lines must take the oracle path and still match byte-for-byte."""
        vcf = make_vcf(204, 64, 12)
        lines = vcf.split(b"\n")
        # widen one sample on a data line (first data line = index 2)
        parts = lines[2].split(b"\t")
        parts[9 + 3] = b"10|2"
        lines[2] = b"\t".join(parts)
        mutated = b"\n".join(lines)
        assert engine.compress(mutated, force_device=True) == compress_bytes(mutated)

    def test_bad_separator_detected_on_device(self, device_parse):
        """A line with tab-less compensating widths passes the host
        length check; the device separator reduce must catch it."""
        vcf = make_vcf(205, 8, 12)
        lines = vcf.split(b"\n")
        parts = lines[2].split(b"\t")
        # replace two 3-byte fields by one 7-byte field: same region
        # length, but a separator byte is now 'x'
        assert len(parts) == 9 + 8
        merged = parts[9] + b"x" + parts[10]
        lines[2] = b"\t".join(parts[:9] + [merged] + parts[11:])
        mutated = b"\n".join(lines)
        assert engine.compress(mutated, force_device=True) == compress_bytes(mutated)

    def test_small_input_falls_back(self, device_parse):
        vcf = make_vcf(206, 4, 3)
        # below _DEVICE_MIN_CELLS without force_device: plain path
        assert engine.compress(vcf) == compress_bytes(vcf)


class TestDeviceParseDecompress:
    @pytest.mark.parametrize("seed,samples", [(211, 127), (212, 300), (213, 2504)])
    def test_lossless(self, device_parse, seed, samples):
        vcf = make_vcf(seed, samples, 24, sv_every=5)
        vcfc = compress_bytes(vcf)
        assert engine.decompress(vcfc, force_device=True) == vcf

    def test_escape_lengths_vary(self, device_parse):
        """Escapes longer/shorter than the 3-byte placeholder splice
        correctly over the device text plane."""
        vcf = make_vcf(214, 64, 12)
        lines = vcf.split(b"\n")
        parts = lines[2].split(b"\t")
        parts[9] = b"10|2"       # 4-byte escape, first sample
        parts[9 + 63] = b"2|10"  # 4-byte escape, LAST sample (newline sep)
        lines[2] = b"\t".join(parts)
        mutated = b"\n".join(lines)
        vcfc = compress_bytes(mutated)
        assert engine.decompress(vcfc, force_device=True) == mutated
        assert decompress_bytes(vcfc) == mutated

    def test_roundtrip_through_both_routes(self, device_parse):
        vcf = make_vcf(215, 384, 32, sv_every=7)
        vcfc = engine.compress(vcf, force_device=True)
        assert vcfc == compress_bytes(vcf)
        assert engine.decompress(vcfc, force_device=True) == vcf

    @pytest.mark.parametrize("samples", [126, 127, 128, 129, 255, 256, 257])
    def test_boundary_widths(self, device_parse, samples):
        """Run caps (127) and scan-doubling powers (128/256) are where
        off-by-ones live; the text routes must hold across them."""
        vcf = make_vcf(300 + samples, samples, 16)
        vcfc = engine.compress(vcf, force_device=True)
        assert vcfc == compress_bytes(vcf)
        assert engine.decompress(vcfc, force_device=True) == vcf

    def test_wide_cohort_text_routes(self, device_parse):
        """The text routes hold at wide sample axes too (adaptive line
        batch + wide kernels)."""
        vcf = make_vcf(216, 8192, 6, sv_every=5)
        vcfc = engine.compress(vcf, force_device=True)
        assert vcfc == compress_bytes(vcf)
        assert engine.decompress(vcfc, force_device=True) == vcf
