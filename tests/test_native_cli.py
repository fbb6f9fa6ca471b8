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


def run(args, env=None):
    import os

    e = dict(os.environ, **env) if env else None
    return subprocess.run([cli_path(), *args], capture_output=True, check=True, env=e)


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

    def test_multiworker_paths_byte_identical(self, corpus):
        """VCFC_WORKERS=4 forces the multi-thread code paths even on
        single-core machines (where hardware_concurrency()==1 would
        otherwise leave them unexecuted): compress, decompress, and the
        parallel range-decode must stay byte-identical and ordered."""
        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        env = {"VCFC_WORKERS": "4"}
        out = d / "w4.vcfc"
        run(["compress", vcf_path, str(out)], env=env)
        assert out.read_bytes() == vcfc
        rt = d / "w4.vcf"
        run(["decompress", vcfc_path, str(rt)], env=env)
        assert rt.read_bytes() == vcf
        # >=64 hits engages the parallel hit decode; order must hold
        q = parse_coordinate_string("1:1-999999999")
        want = b"".join(query_full_scan(vcfc, q))
        got = run(["query", vcfc_path, "1:1-999999999"], env=env).stdout
        assert got == want

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


class TestNativeCliSparse:
    """Sparse verbs and gap-analysis must agree with the Python engines."""

    def test_sparsify_and_query(self, corpus, tmp_path):
        import os

        from vcfc_tpu.index.sparsify import query_sparse_file, sparsify_file

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        py_sparse = tmp_path / "py.sparse"
        nat_sparse = tmp_path / "nat.sparse"
        sparsify_file(vcfc, str(py_sparse))
        run(["sparsify", vcfc_path, str(nat_sparse)])
        assert os.path.getsize(py_sparse) == os.path.getsize(nat_sparse)

        for region in ["1:1213-1213", "1:1000-4000", "X:8000-9000", "1:5-5"]:
            q = parse_coordinate_string(region)
            want = b"".join(query_sparse_file(str(py_sparse), q))
            got = run(["sparse-query", str(nat_sparse), region]).stdout
            assert got == want, region
            # cross-check: native query over the python-written sparse file
            assert run(["sparse-query", str(py_sparse), region]).stdout == want

    def test_sparse_external_index(self, corpus):
        from vcfc_tpu.index.sparse_external import query_sparse_external_index
        from vcfc_tpu.utils.config import SPARSE_EXTERNAL_INDEX_CONFIG

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        run(["create-sparse-index", vcfc_path])
        for region in ["1:1213-1213", "1:1000-4000", "X:8000-9000"]:
            q = parse_coordinate_string(region)
            want = b"".join(
                query_sparse_external_index(
                    vcfc, vcfc_path + ".vcfci-sparse", q, SPARSE_EXTERNAL_INDEX_CONFIG
                )
            )
            got = run(["query-sparse-index", vcfc_path, region]).stdout
            assert got == want, region

    def test_gap_analysis(self, corpus, tmp_path, monkeypatch):
        from vcfc_tpu.query.engine import gap_analysis

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        monkeypatch.chdir(tmp_path)
        import subprocess

        subprocess.run([cli_path(), "gap-analysis", vcfc_path], check=True)
        got = (tmp_path / "start-positions.txt").read_bytes()
        want = b"".join(
            b"%s %d %d\n" % (pos, size, comp) for pos, size, comp in gap_analysis(vcfc)
        )
        assert got == want


class TestNativeCliVcfz:
    def test_query_z_and_decompress_z(self, corpus, tmp_path):
        from vcfc_tpu.format.vcfz import query_vcfz, vcfz_from_vcfc

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        z = vcfz_from_vcfc(vcfc)
        z_path = tmp_path / "c.vcfz"
        z_path.write_bytes(z)

        out = tmp_path / "z.vcf"
        run(["decompress-z", str(z_path), str(out)])
        assert out.read_bytes() == vcf

        for region in ["1", "X", "1:1000-5000", "X:8000-12000", "7"]:
            q = parse_coordinate_string(region)
            want = b"".join(query_vcfz(z, q))
            got = run(["query-z", str(z_path), region]).stdout
            assert got == want, region

    def test_query_z_v1_container(self, corpus, tmp_path):
        from vcfc_tpu.format.vcfz import query_vcfz, vcfz_from_vcfc

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        z = vcfz_from_vcfc(vcfc, version=1)
        z_path = tmp_path / "c1.vcfz"
        z_path.write_bytes(z)
        q = parse_coordinate_string("1:1000-5000")
        want = b"".join(query_vcfz(z, q))
        assert run(["query-z", str(z_path), "1:1000-5000"]).stdout == want

    def test_compress_z_byte_identical(self, corpus, tmp_path):
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        want = vcfz_from_vcfc(vcfc)
        out = tmp_path / "n.vcfz"
        run(["compress-z", vcfc_path, str(out)])
        assert out.read_bytes() == want
        out2 = tmp_path / "n2.vcfz"
        run(["compress-z", vcf_path, str(out2)])
        assert out2.read_bytes() == want

    @pytest.mark.parametrize("verb", ["decompress-z", "query-z"])
    def test_crafted_codebook_rejected(self, corpus, tmp_path, verb):
        """Kraft-violating code-length tables in an untrusted .vcfz must
        die cleanly in the NATIVE reader too — an over-subscribed table
        (e.g. every symbol at length 1) would otherwise index past the
        2^15-row decode table (heap OOB writes, ASAN-verified before the
        guard was added)."""
        import struct

        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        z = bytearray(vcfz_from_vcfc(vcfc, version=3))
        # walk the container to the first code-length table
        off = 4 + 9  # magic + (version u32, max_len u8, block_lines u32)
        off += 12 + 8  # (n_lines u64, n_samples u32) + header_len u64
        header_len = struct.unpack_from("<Q", z, off - 8)[0]
        off += header_len
        (n_esc,) = struct.unpack_from("<I", z, off)
        off += 4
        for _ in range(n_esc):
            (elen,) = struct.unpack_from("<H", z, off)
            off += 2 + elen
        (n_symbols,) = struct.unpack_from("<I", z, off)
        off += 4
        z[off : off + n_symbols] = bytes([1]) * n_symbols  # oversubscribed
        z_path = tmp_path / "kraft.vcfz"
        z_path.write_bytes(bytes(z))
        args = [str(z_path), str(tmp_path / "out.vcf")] \
            if verb == "decompress-z" else [str(z_path), "1:1000-5000"]
        r = subprocess.run([cli_path(), verb, *args], capture_output=True)
        assert r.returncode != 0
        assert b"Kraft" in r.stderr or b"corrupt codebook" in r.stderr

    @pytest.mark.parametrize("version", [1, 2, 3, 8])
    def test_query_z_all_versions(self, corpus, tmp_path, version):
        from vcfc_tpu.format.vcfz import query_vcfz, vcfz_from_vcfc

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        z = vcfz_from_vcfc(vcfc, version=version)
        z_path = tmp_path / f"v{version}.vcfz"
        z_path.write_bytes(z)
        q = parse_coordinate_string("1:1000-5000")
        want = b"".join(query_vcfz(z, q))
        assert run(["query-z", str(z_path), "1:1000-5000"]).stdout == want
        out = tmp_path / f"v{version}.vcf"
        run(["decompress-z", str(z_path), str(out)])
        assert out.read_bytes() == vcf


class TestNativeCliManifest:
    def test_manifest_byte_identical_and_queries(self, corpus, tmp_path):
        from vcfc_tpu.index.manifest import Manifest, build_manifest, query_manifest

        d, vcf, vcfc, vcf_path, vcfc_path = corpus
        run(["create-manifest", vcfc_path])
        want_m = build_manifest(vcfc)
        got_m = (d / "c.vcfc.vcfcm").read_bytes()
        assert got_m == want_m

        manifest = Manifest(want_m)
        for region in ["1", "X", "1:1000-5000", "X:8000-12000", "1:5500-5500", "7"]:
            q = parse_coordinate_string(region)
            want = b"".join(query_manifest(vcfc, manifest, q))
            got = run(["query-manifest", vcfc_path, region]).stdout
            assert got == want, region
