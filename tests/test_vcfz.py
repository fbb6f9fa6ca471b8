"""`.vcfz` entropy-coded container: lossless transcoding + queries + ratio."""

import numpy as np
import pytest

from vcfc_tpu.format.vcfz import (
    VcfzReader,
    decompress_vcfz,
    query_vcfz,
    vcfz_from_vcfc,
)
from vcfc_tpu.query.coordinate import parse_coordinate_string


class TestVcfz:
    def test_small_roundtrip(self, small_vcf, small_vcfc):
        z = vcfz_from_vcfc(small_vcfc, block_lines=32)
        assert VcfzReader.parse(z).to_vcfc() == small_vcfc
        assert decompress_vcfz(z) == small_vcf

    def test_sv_roundtrip(self, sv_vcf, sv_vcfc):
        z = vcfz_from_vcfc(sv_vcfc, block_lines=4)
        assert VcfzReader.parse(z).to_vcfc() == sv_vcfc
        assert decompress_vcfz(z) == sv_vcf

    def test_beats_vcfc_size(self, small_vcfc):
        z = vcfz_from_vcfc(small_vcfc)
        assert len(z) < len(small_vcfc)

    def test_query_matches_binned(self, small_vcfc, data_dir):
        z = vcfz_from_vcfc(small_vcfc, block_lines=16)
        golden = (data_dir / "qb_small_10100_10150.out").read_bytes()
        q = parse_coordinate_string("1:10100-10150")
        assert b"".join(query_vcfz(z, q)) == golden

    def test_query_sv_overlap(self, sv_vcfc, data_dir):
        z = vcfz_from_vcfc(sv_vcfc, block_lines=3)
        golden = (data_dir / "qb_sv_400_460.out").read_bytes()
        q = parse_coordinate_string("1:400-460")
        assert b"".join(query_vcfz(z, q)) == golden

    def test_native_and_oracle_decode_agree(self, small_vcfc, monkeypatch):
        z = vcfz_from_vcfc(small_vcfc, block_lines=64)
        native_out = VcfzReader.parse(z).to_vcfc()
        monkeypatch.setenv("VCFC_NO_NATIVE", "1")
        oracle_out = VcfzReader.parse(z).to_vcfc()
        assert native_out == oracle_out == small_vcfc


class TestVcfzCli:
    def _run(self, *args):
        import os, subprocess, sys

        return subprocess.run(
            [sys.executable, "-m", "vcfc_tpu.cli", *args],
            capture_output=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )

    def test_cli_cycle(self, tmp_path, data_dir, sv_vcf, sv_vcfc):
        z = tmp_path / "sv.vcfz"
        out = tmp_path / "sv.out.vcf"
        r = self._run("compress-z", str(data_dir / "sv.vcf"), str(z))
        assert r.returncode == 0, r.stderr
        r = self._run("decompress-z", str(z), str(out))
        assert r.returncode == 0, r.stderr
        assert out.read_bytes() == sv_vcf
        r = self._run("query-z", str(z), "1:400-460")
        assert r.returncode == 0, r.stderr
        assert r.stdout == (data_dir / "qb_sv_400_460.out").read_bytes()

    def test_cli_accepts_vcfc_input(self, tmp_path, data_dir, sv_vcfc):
        z = tmp_path / "sv2.vcfz"
        r = self._run("compress-z", str(data_dir / "sv.vcfc"), str(z))
        assert r.returncode == 0, r.stderr
        from vcfc_tpu.format.vcfz import VcfzReader

        assert VcfzReader.parse(z.read_bytes()).to_vcfc() == sv_vcfc
