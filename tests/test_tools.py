"""uniqc + synthetic generator tests."""

import io
import sys

import numpy as np

from vcfc_tpu.eval.random_vcf import generate_vcf
from vcfc_tpu.tools import uniqc


def _capture(fn, text):
    old_out, old_in = sys.stdout, sys.stdin
    sys.stdout, sys.stdin = io.StringIO(), io.StringIO(text)
    try:
        fn(sys.stdin)
        return sys.stdout.getvalue()
    finally:
        sys.stdout, sys.stdin = old_out, old_in


class TestUniqc:
    def test_counts(self):
        out = _capture(uniqc.do_counts, "b a b\nc a\n")
        assert out == "a 2\nb 2\nc 1\n"

    def test_counts_by_line(self):
        out = _capture(uniqc.do_counts_by_line, "b a b\na a\n")
        assert out == "a 1\nb 2\na 2\n"

    def test_runs_by_line(self):
        out = _capture(uniqc.do_runs_by_line, "x x y x\nz\n")
        assert out == "x 2\ny 1\nx 1\nz 1\n"


class TestRandomVcf:
    def test_shape_and_distribution(self):
        vcf = generate_vcf(sample_count=50, variant_count=40, seed=5)
        lines = vcf.split(b"\n")
        assert lines[0] == b"##fileformat=VCFv4.1"
        header = [l for l in lines if l.startswith(b"#CHROM")][0]
        assert header.count(b"\t") == 8 + 50
        data = [l for l in lines if l and not l.startswith(b"#")]
        assert len(data) == 40
        cols = data[0].split(b"\t")
        assert len(cols) == 9 + 50
        assert cols[8] == b"GT"
        # ~81% 0|0 plus escape tail with allele 2 somewhere in the file
        gts = b"\t".join(l.split(b"\t", 9)[9] for l in data).split(b"\t")
        frac00 = sum(1 for g in gts if g == b"0|0") / len(gts)
        assert 0.7 < frac00 < 0.9
        assert any(b"2" in g for g in gts)

    def test_seeded_determinism(self):
        a = generate_vcf(sample_count=10, variant_count=5, seed=7)
        b = generate_vcf(sample_count=10, variant_count=5, seed=7)
        c = generate_vcf(sample_count=10, variant_count=5, seed=8)
        assert a == b != c

    def test_roundtrips_through_engine(self):
        from vcfc_tpu.format import compress_bytes, decompress_bytes

        vcf = generate_vcf(sample_count=30, variant_count=20, seed=5)
        assert decompress_bytes(compress_bytes(vcf)) == vcf


class TestAnalysis:
    def test_genotype_counts(self):
        from vcfc_tpu.tools.analysis import genotype_counts

        vcf = [b"##m=1\n", b"#CHROM\tx\n", b"1\t1\ti\tA\tT\t.\t.\t.\tGT\t0|0\t0|1\t0|0\n"]
        assert genotype_counts(vcf) == {"0|0": 2, "0|1": 1}

    def test_run_length_histograms_and_savings(self):
        from vcfc_tpu.tools.analysis import rle_savings, run_length_histograms

        vcf = [b"1\t1\ti\tA\tT\t.\t.\t.\tGT\t0|0\t0|0\t0|0\t1|1\n"]
        hists = run_length_histograms(vcf)
        assert hists == {"0|0": {3: 1}, "1|1": {1: 1}}
        sv = rle_savings(hists, 100)
        # reference calc_savings (repetition-analysis.py:47-52):
        # every run element saves (4-1)=3 bytes -> (3+1)*3 = 12
        assert sv["bytes_saved"] == 12 and sv["total_runs"] == 2

    def test_gap_stats(self):
        from vcfc_tpu.tools.analysis import gap_analysis_stats

        rows = ["100 500 120\n", "102 480 100\n"]
        st = gap_analysis_stats(rows)
        assert st["lines"] == 2
        assert st["compressed_total"] == 220
        assert abs(st["ratio"] - 980 / 220) < 1e-9


class TestRealisticGenerator:
    """1000G-workload-faithful generator (VERDICT r4 #6): every genotype
    class it emits must survive the full codec stack byte-exactly."""

    def _vcf(self, **kw):
        from vcfc_tpu.eval.random_vcf import generate_realistic_vcf

        args = dict(
            sample_count=80,
            variant_count=260,
            seed=9,
            missing_rate=0.01,
            unphased_rate=0.05,
            multiallelic_rate=0.1,
            indel_rate=0.08,
        )
        args.update(kw)
        return generate_realistic_vcf(**args)

    def test_genotype_classes_present(self):
        vcf = self._vcf()
        assert b"./." in vcf  # missing
        assert b"0/" in vcf or b"/0" in vcf  # unphased
        assert b"2|" in vcf or b"|2" in vcf  # multi-allelic carrier
        assert b"AC=" in vcf and b"AF=" in vcf and b"AN=" in vcf
        # full contig sweep: several distinct chromosomes appear
        chroms = {l.split(b"\t", 1)[0] for l in vcf.splitlines() if l and not l.startswith(b"#")}
        assert len(chroms) >= 10

    def test_codec_roundtrip_all_containers(self):
        from vcfc_tpu import engine
        from vcfc_tpu.format.vcfz import decompress_vcfz, vcfz_from_vcfc

        vcf = self._vcf()
        vcfc = engine.compress(vcf)
        assert engine.decompress(vcfc) == vcf
        for v in (3, 4, 7, 8):
            assert decompress_vcfz(vcfz_from_vcfc(vcfc, version=v)) == vcf

    def test_unknown_contig_ordinal_zero(self):
        """Unknown contigs lead the file (ordinal 0) and full-scan
        queries return them; the binned index keeps the reference's
        unknown->0 behavior without crashing at scale."""
        from vcfc_tpu import engine
        from vcfc_tpu.index.binned import BinnedIndexConfig, build_binned_index, query_binned_index
        from vcfc_tpu.query.coordinate import parse_coordinate_string
        from vcfc_tpu.query.engine import query_full_scan

        vcf = self._vcf(unknown_contigs=("GL000226.1", "GL000229.1"))
        vcfc = engine.compress(vcf)
        hits = list(query_full_scan(vcfc, parse_coordinate_string("GL000226.1")))
        assert hits and all(h.startswith(b"GL000226.1\t") for h in hits)
        idx = build_binned_index(vcfc, BinnedIndexConfig(entries_per_bin=16))
        # both unknown contigs collapse to ordinal 0: a binned query for
        # either scans the ordinal-0 span (the reference's footgun kept)
        got = list(query_binned_index(vcfc, idx, parse_coordinate_string("GL000229.1")))
        assert all(
            h.split(b"\t", 1)[0] in (b"GL000226.1", b"GL000229.1") for h in got
        )

    def test_ld_mode_composes(self):
        from vcfc_tpu import engine
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        vcf = self._vcf(mutation_rate=0.05, contigs=(("1", 1.0),))
        vcfc = engine.compress(vcf)
        assert engine.decompress(vcfc) == vcf
        z4 = vcfz_from_vcfc(vcfc, version=4)
        z3 = vcfz_from_vcfc(vcfc, version=3)
        assert len(z4) < len(z3)  # vertical prediction wins under LD

    def test_deterministic(self):
        assert self._vcf() == self._vcf()
