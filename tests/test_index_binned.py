"""Binned index: byte-identical .vcfci build and golden query outputs."""

import numpy as np
import pytest

from vcfc_tpu.index.binned import build_binned_index, load_entries, query_binned_index
from vcfc_tpu.query.coordinate import (
    CoordinateQuery,
    compute_end_position,
    parse_coordinate_string,
)
from vcfc_tpu.utils.config import BinnedIndexConfig


class TestBuild:
    def test_small_b10_matches_reference(self, data_dir, small_vcfc):
        golden = (data_dir / "small.vcfc.vcfci-b10").read_bytes()
        ours = build_binned_index(small_vcfc, BinnedIndexConfig(entries_per_bin=10))
        assert ours == golden

    def test_sv_b2_matches_reference(self, data_dir, sv_vcfc):
        golden = (data_dir / "sv.vcfc.vcfci-b2").read_bytes()
        ours = build_binned_index(sv_vcfc, BinnedIndexConfig(entries_per_bin=2))
        assert ours == golden

    def test_entries_strictly_increasing(self, small_vcfc):
        idx = build_binned_index(small_vcfc, BinnedIndexConfig(entries_per_bin=10))
        entries = load_entries(idx)
        keys = [(e.reference_name_idx, e.position) for e in entries]
        assert keys == sorted(keys)
        assert all(
            keys[i] < keys[i + 1] for i in range(len(keys) - 1)
        ), "entry positions must be strictly increasing"


class TestQuery:
    def _run(self, vcfc, vcfci, region):
        q = parse_coordinate_string(region)
        return b"".join(query_binned_index(vcfc, vcfci, q))

    def test_small_range_matches_reference_stdout(self, data_dir, small_vcfc):
        vcfci = (data_dir / "small.vcfc.vcfci-b10").read_bytes()
        golden = (data_dir / "qb_small_10100_10150.out").read_bytes()
        assert self._run(small_vcfc, vcfci, "1:10100-10150") == golden

    def test_sv_overlap_matches_reference_stdout(self, data_dir, sv_vcfc):
        vcfci = (data_dir / "sv.vcfc.vcfci-b2").read_bytes()
        golden = (data_dir / "qb_sv_400_460.out").read_bytes()
        # 1:400-460 must pick up v2 (END=450) and v3 (SVLEN span) via
        # SV-aware end positions
        assert self._run(sv_vcfc, vcfci, "1:400-460") == golden

    def test_sv_second_region(self, data_dir, sv_vcfc):
        vcfci = (data_dir / "sv.vcfc.vcfci-b2").read_bytes()
        golden = (data_dir / "qb_sv_290_310.out").read_bytes()
        assert self._run(sv_vcfc, vcfci, "1:290-310") == golden

    def test_empty_result(self, data_dir, small_vcfc):
        vcfci = (data_dir / "small.vcfc.vcfci-b10").read_bytes()
        assert self._run(small_vcfc, vcfci, "2:1-2") == b""


class TestEndPosition:
    def test_snp(self):
        assert compute_end_position(100, b"A", b"T", b".") == 100

    def test_deletion_ref_span(self):
        assert compute_end_position(100, b"ACGT", b"A", b".") == 103

    def test_insertion_alt_span(self):
        assert compute_end_position(100, b"A", b"ACGTACGT", b".") == 107

    def test_multiallelic_max(self):
        assert compute_end_position(100, b"AC", b"A,ACGTG", b".") == 104

    def test_sv_end(self):
        assert compute_end_position(100, b"A", b"<DEL>", b"SVTYPE=DEL;END=450") == 450

    def test_sv_end_multi_max(self):
        assert compute_end_position(100, b"A", b"<CN0>", b"END=800,750") == 800

    def test_sv_svlen(self):
        assert compute_end_position(100, b"A", b"<INS:ME:ALU>", b"SVLEN=320") == 419

    def test_sv_svlen_negative_abs(self):
        assert compute_end_position(100, b"A", b"<DEL>", b"SVLEN=-50,-80") == 179

    def test_sv_no_info_defaults_to_pos(self):
        assert compute_end_position(100, b"A", b"<DUP>", b"SVTYPE=DUP") == 100


class TestCoordinateModel:
    def test_parse_ref_only(self):
        q = parse_coordinate_string("22")
        assert q.reference_name == "22" and not q.has_start

    def test_parse_range(self):
        q = parse_coordinate_string("X:5-10")
        assert (q.reference_name, q.start_position, q.end_position) == ("X", 5, 10)

    def test_parse_missing_dash(self):
        with pytest.raises(ValueError):
            parse_coordinate_string("1:5")

    def test_compare_to_range_overlap(self):
        q = CoordinateQuery.range("1", 100, 200)
        assert q.compare_to_range("1", 150, 160) == 0
        assert q.compare_to_range("1", 10, 99) == 1
        assert q.compare_to_range("1", 201, 300) == -1
        assert q.compare_to_range("2", 1, 2) == -1  # later chromosome
        assert q.compare_to_range("1", 50, 100) == 0  # touching start

    def test_unknown_reference_maps_to_zero(self):
        # the reference's map operator[] quirk (utils.cpp:23-25)
        q = CoordinateQuery.range("chrUn", 1, 10)
        assert q.compare_to_range("1", 5, 6) == -1


class TestEndPositionEdgeCases:
    """The reference folds END with max_end=0 and only `end > max_end`
    updates (main.cpp:800-809): empty/all-negative END values yield 0;
    the analogous abs() fold makes empty SVLEN yield pos-1. Verified
    byte-identical against the reference binary on .vcfci output."""

    def test_reference_fold_semantics(self):
        from vcfc_tpu.query.coordinate import compute_end_position

        assert compute_end_position(500, b"N", b"<DEL>", b"END=") == 0
        assert compute_end_position(600, b"N", b"<DEL>", b"END=-100") == 0
        assert compute_end_position(800, b"N", b"<DEL>", b"END=-5,-9") == 0
        assert compute_end_position(900, b"N", b"<DEL>", b"END=850,1200") == 1200
        assert compute_end_position(700, b"N", b"<INS>", b"SVLEN=") == 699
        assert compute_end_position(950, b"N", b"<DUP>", b"SVLEN=-60,40") == 1009
        assert compute_end_position(100, b"N", b"<DEL>", b"SVTYPE=DEL") == 100
