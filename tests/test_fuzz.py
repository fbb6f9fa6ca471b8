"""Differential fuzzing: every fast path must agree with the format oracle
(and therefore the reference binary), and every query engine must agree
with the full-scan engine, on randomized inputs.

Widths are chosen to straddle the kernel's scan-doubling and run-cap
boundaries (127/128/255/256) where off-by-ones would hide.
"""

import numpy as np
import pytest

from vcfc_tpu import engine
from vcfc_tpu.format import compress_bytes, decompress_bytes
from vcfc_tpu.index.binned import build_binned_index, query_binned_index
from vcfc_tpu.index.manifest import Manifest, build_manifest, query_manifest
from vcfc_tpu.query.coordinate import parse_coordinate_string
from vcfc_tpu.query.engine import query_full_scan
from vcfc_tpu.utils.config import BinnedIndexConfig

GTS = [b"0|0", b"0|1", b"1|0", b"1|1", b"2|0", b"0|2", b"./.", b"3|3"]
P = [0.62, 0.09, 0.09, 0.06, 0.04, 0.04, 0.03, 0.03]


def make_vcf(seed: int, samples: int, variants: int, *, sv_every: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    out = [b"##fileformat=VCFv4.2\n##source=fuzz\n"]
    hdr = b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
    out.append(hdr + b"".join(b"\tS%d" % j for j in range(samples)) + b"\n")
    pos = 1000
    for i in range(variants):
        pos += int(rng.integers(1, 400))
        chrom = b"1" if i < variants // 2 else b"X"
        if sv_every and i % sv_every == 2:
            ref, alt = b"N", b"<DEL>"
            info = b"END=%d" % (pos + int(rng.integers(10, 3000)))
        else:
            ref = [b"A", b"C", b"GT"][int(rng.integers(3))]
            alt = [b"G", b"T,A", b"TTA"][int(rng.integers(3))]
            info = b"."
        row = [chrom, str(pos).encode(), b"v%d" % i, ref, alt, b"50", b"PASS", info, b"GT"]
        if i % 23 == 7:  # long homozygous run exercising the 127 cap
            row += [b"0|0"] * samples
        elif i % 23 == 15:  # long het run exercising the 31 cap
            row += [b"0|1"] * samples
        else:
            row += list(rng.choice(GTS, p=P, size=samples))
        out.append(b"\t".join(row) + b"\n")
    return b"".join(out)


class TestCodecFuzz:
    # widths straddle run caps (127) and scan-doubling powers (128/256)
    @pytest.mark.parametrize(
        "seed,samples",
        [(101, 126), (102, 127), (103, 128), (104, 129), (105, 255), (106, 256), (107, 257)],
    )
    def test_boundary_widths_roundtrip(self, seed, samples):
        vcf = make_vcf(seed, samples, 24)
        oracle = compress_bytes(vcf)
        assert engine.compress(vcf, force_device=True) == oracle
        assert engine.decompress(oracle, force_device=True) == vcf
        assert decompress_bytes(oracle) == vcf

    def test_numpy_fallback_fuzz(self, monkeypatch):
        monkeypatch.setenv("VCFC_NO_NATIVE", "1")
        vcf = make_vcf(201, 130, 20, sv_every=5)
        oracle = compress_bytes(vcf)
        assert engine.compress(vcf, force_device=True) == oracle
        assert engine.decompress(oracle, force_device=True) == vcf

    def test_host_executor_fuzz(self, monkeypatch):
        monkeypatch.setenv("VCFC_EXECUTOR", "host")
        vcf = make_vcf(202, 140, 20, sv_every=7)
        oracle = compress_bytes(vcf)
        assert engine.compress(vcf, force_device=True) == oracle
        assert engine.decompress(oracle, force_device=True) == vcf


class TestQueryEnginesAgree:
    """All random-access engines must return exactly the full-scan answer."""

    @pytest.fixture(scope="class")
    def corpus(self):
        vcf = make_vcf(301, 60, 80, sv_every=9)
        vcfc = compress_bytes(vcf)
        vcfci = build_binned_index(vcfc, BinnedIndexConfig(7))
        manifest = Manifest(build_manifest(vcfc))
        return vcf, vcfc, vcfci, manifest

    REGIONS = ["1", "X", "1:1000-4000", "1:5000-5000", "X:1-999999", "X:7000-9000", "7", "1:999999-9999999"]

    @pytest.mark.parametrize("region", REGIONS)
    def test_binned_matches_full_scan(self, corpus, region):
        vcf, vcfc, vcfci, _ = corpus
        q = parse_coordinate_string(region)
        got = b"".join(query_binned_index(vcfc, vcfci, q))
        if not q.has_start and not q.has_end:
            # faithful reference quirk: the binned engine's range compare
            # treats a ref-only query as the empty range [0, 0]
            # (main.cpp:110-137 with has_start/has_end false), so
            # ref-only binned queries return nothing — verified against
            # the reference binary.
            assert got == b""
        else:
            want = b"".join(query_full_scan(vcfc, q))
            assert got == want

    @pytest.mark.parametrize("region", REGIONS)
    def test_manifest_matches_full_scan(self, corpus, region):
        vcf, vcfc, _, manifest = corpus
        q = parse_coordinate_string(region)
        want = b"".join(query_full_scan(vcfc, q))
        got = b"".join(query_manifest(vcfc, manifest, q))
        assert got == want

    @pytest.mark.parametrize("region", REGIONS)
    def test_vcfz_matches_full_scan(self, corpus, region):
        from vcfc_tpu.format.vcfz import query_vcfz, vcfz_from_vcfc

        vcf, vcfc, _, _ = corpus
        vcfz = vcfz_from_vcfc(vcfc)
        q = parse_coordinate_string(region)
        want = b"".join(query_full_scan(vcfc, q))
        got = b"".join(query_vcfz(vcfz, q))
        assert got == want

    def test_vcfz_roundtrip(self, corpus):
        from vcfc_tpu.format.vcfz import decompress_vcfz, vcfz_from_vcfc

        vcf, vcfc, _, _ = corpus
        assert decompress_vcfz(vcfz_from_vcfc(vcfc)) == vcf
