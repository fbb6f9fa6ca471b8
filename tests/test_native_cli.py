"""The native CLI (native/vcfcq) must agree byte-for-byte with the Python
engines (and therefore the reference binary) on every verb it implements."""

import subprocess

import pytest

from vcfc_tpu.format import compress_bytes, decompress_bytes
from vcfc_tpu.host.native import cli_path
from vcfc_tpu.index.binned import build_binned_index, query_binned_index
from vcfc_tpu.query.coordinate import parse_coordinate_string
from vcfc_tpu.query.engine import query_full_scan
from vcfc_tpu.utils.config import BinnedIndexConfig

from test_fuzz import make_vcf

pytestmark = pytest.mark.skipif(cli_path() is None, reason="vcfcq not built")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("vcfcq")
    vcf = make_vcf(401, 90, 120, sv_every=11)
    vcfc = compress_bytes(vcf)
    vcf_path = d / "c.vcf"
    vcfc_path = d / "c.vcfc"
    vcf_path.write_bytes(vcf)
    vcfc_path.write_bytes(vcfc)
    return d, vcf, vcfc, str(vcf_path), str(vcfc_path)


def run(args):
    return subprocess.run([cli_path(), *args], capture_output=True, check=True)


class TestNativeCli:
    def test_compress_byte_identical(self, corpus):
        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        out = d / "n.vcfc"
        run(["compress", vcf_path, str(out)])
        assert out.read_bytes() == vcfc

    def test_decompress_lossless(self, corpus):
        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        out = d / "n.vcf"
        run(["decompress", vcfc_path, str(out)])
        assert out.read_bytes() == vcf

    def test_binned_index_byte_identical(self, corpus):
        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        run(["create-binned-index", "9", vcfc_path])
        want = build_binned_index(vcfc, BinnedIndexConfig(9))
        assert (d / "c.vcfc.vcfci").read_bytes() == want

    @pytest.mark.parametrize(
        "region", ["1", "X", "1:1000-5000", "X:8000-12000", "1:5500-5500", "7", "1:1-999999999"]
    )
    def test_queries_match_python(self, corpus, region):
        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        q = parse_coordinate_string(region)
        want_full = b"".join(query_full_scan(vcfc, q))
        got_full = run(["query", vcfc_path, region]).stdout
        assert got_full == want_full

        run(["create-binned-index", "9", vcfc_path])
        vcfci = (d / "c.vcfc.vcfci").read_bytes()
        want_binned = b"".join(query_binned_index(vcfc, vcfci, q))
        got_binned = run(["query-binned-index", vcfc_path, region]).stdout
        assert got_binned == want_binned

    def test_timing_probes(self, corpus):
        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        run(["create-binned-index", "9", vcfc_path])
        out = subprocess.run(
            [cli_path(), "query-binned-index", vcfc_path, "1:1000-2000"],
            capture_output=True,
            check=True,
            env={"VCFC_TIMING": "1", "PATH": "/usr/bin:/bin"},
        ).stdout
        assert b"TIMING decompress2_metadata_headers: " in out
        assert b"TIMING index_search: " in out
        assert b"TIMING decompress_iteration: " in out
