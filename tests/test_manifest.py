"""Block manifest: differential vs binned-index query (overlap semantics)."""

import numpy as np

from vcfc_tpu.index.binned import build_binned_index, query_binned_index
from vcfc_tpu.index.manifest import Manifest, build_manifest, query_manifest
from vcfc_tpu.query.coordinate import parse_coordinate_string
from vcfc_tpu.utils.config import BinnedIndexConfig


def _q(vcfc, manifest, region):
    return b"".join(query_manifest(vcfc, manifest, parse_coordinate_string(region)))


def _qb(vcfc, region, bin_size=5):
    idx = build_binned_index(vcfc, BinnedIndexConfig(bin_size))
    return b"".join(query_binned_index(vcfc, idx, parse_coordinate_string(region)))


class TestManifest:
    def test_roundtrip_parse(self, small_vcfc):
        m = Manifest(build_manifest(small_vcfc))
        assert m.n_lines == 200
        assert (np.diff(m.offset.astype(np.int64)) > 0).all()

    def test_matches_binned_query(self, small_vcfc):
        m = Manifest(build_manifest(small_vcfc))
        for region in ["1:10100-10150", "1:1-9000", "1:10396-10500"]:
            assert _q(small_vcfc, m, region) == _qb(small_vcfc, region), region

    def test_ref_only_matches_full_scan(self, small_vcfc):
        # bare-ref queries: the binned engine returns nothing (compare_to_range
        # ignores has_* flags, main.cpp:110-137); the manifest follows the
        # full-scan semantics instead and returns the whole chromosome
        from vcfc_tpu.query.engine import query_full_scan

        m = Manifest(build_manifest(small_vcfc))
        q = parse_coordinate_string("1")
        assert _q(small_vcfc, m, "1") == b"".join(query_full_scan(small_vcfc, q))

    def test_sv_overlap_semantics(self, sv_vcfc):
        m = Manifest(build_manifest(sv_vcfc))
        # DEL spanning 200-450 and ALU insertion spanning 300-619 overlap
        # 1:400-460 (same result as the SV-aware binned query)
        assert _q(sv_vcfc, m, "1:400-460") == _qb(sv_vcfc, "1:400-460", 2)
        assert _q(sv_vcfc, m, "X:50-50") == _qb(sv_vcfc, "X:50-50", 2)

    def test_long_variant_before_small_bin(self, sv_vcfc):
        # query start inside the DEL's span but after its POS
        m = Manifest(build_manifest(sv_vcfc))
        out = _q(sv_vcfc, m, "1:440-445")
        assert b"v2" in out
