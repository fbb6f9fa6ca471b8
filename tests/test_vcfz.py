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


class TestVcfzVersions:
    def _vcfc(self):
        from test_fuzz import make_vcf
        from vcfc_tpu.format import compress_bytes

        return compress_bytes(make_vcf(501, 70, 90, sv_every=8))

    def test_v1_still_reads(self):
        from vcfc_tpu.format.vcfz import decompress_vcfz, vcfz_from_vcfc
        from vcfc_tpu.format import decompress_bytes

        vcfc = self._vcfc()
        z1 = vcfz_from_vcfc(vcfc, version=1)
        assert decompress_vcfz(z1) == decompress_bytes(vcfc)

    def test_v2_smaller_than_v1(self):
        # context codebooks cost 3 extra length tables, so the win shows
        # on realistically sized inputs (on the 50 MB cohort: -15%)
        from test_fuzz import make_vcf
        from vcfc_tpu.format import compress_bytes
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        vcfc = compress_bytes(make_vcf(502, 400, 400))
        z1 = vcfz_from_vcfc(vcfc, version=1)
        z2 = vcfz_from_vcfc(vcfc, version=2)
        assert len(z2) < len(z1)

    def test_ctx_native_matches_oracle(self):
        import numpy as np
        from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc
        from vcfc_tpu.host import native
        from vcfc_tpu.ops.huffman import CTX_INIT, symbol_classes, unpack_symbols_ctx

        if not native.available():
            import pytest

            pytest.skip("native library unavailable")
        vcfc = self._vcfc()
        r = VcfzReader.parse(vcfz_from_vcfc(vcfc, version=2))
        blk = r.blocks[0]
        payload = r.raw[r.payload_base : r.payload_base + blk["payload_len"]]
        want = unpack_symbols_ctx(payload, int(blk["n_symbols"]), r.books)
        tables = [b.decode_table() for b in r.books]
        got = native.huffman_decode_ctx(
            payload,
            int(blk["n_symbols"]),
            np.stack([t[0] for t in tables]),
            np.stack([t[1] for t in tables]),
            symbol_classes(len(r.books[0].lengths)),
            CTX_INIT,
        )
        np.testing.assert_array_equal(got, np.asarray(want))

    def test_v2_numpy_fallback_roundtrip(self, monkeypatch):
        monkeypatch.setenv("VCFC_NO_NATIVE", "1")
        from vcfc_tpu.format.vcfz import decompress_vcfz, vcfz_from_vcfc
        from vcfc_tpu.format import decompress_bytes

        vcfc = self._vcfc()
        assert decompress_vcfz(vcfz_from_vcfc(vcfc)) == decompress_bytes(vcfc)

    def test_native_and_fallback_bytes_identical(self, monkeypatch):
        # escape ids must be FIRST-OCCURRENCE ordered on both paths:
        # craft escapes whose first appearance (z/z before a/a) differs
        # from sorted order (CLAUDE.md byte contract)
        from vcfc_tpu.format import compress_bytes
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        rows = [
            ["z|2", "0|0", "a|2", "0|0"],
            ["0|0", "a|2", "0|0", "z|2"],
            ["c|2", "0|0", "0|0", "b|2"],
        ]
        lines = [b"##f=1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\tC\tD\n"]
        for i, r in enumerate(rows):
            lines.append(
                b"1\t%d\t.\tA\tT\t9\tPASS\t.\tGT\t" % (100 + i) + "\t".join(r).encode() + b"\n"
            )
        vcfc = compress_bytes(b"".join(lines))
        z_native = vcfz_from_vcfc(vcfc)
        monkeypatch.setenv("VCFC_NO_NATIVE", "1")
        z_fallback = vcfz_from_vcfc(vcfc)
        assert z_native == z_fallback

    @pytest.mark.parametrize("version", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_all_versions_roundtrip_and_query(self, version):
        from vcfc_tpu.format import decompress_bytes
        from vcfc_tpu.format.vcfz import decompress_vcfz, query_vcfz, vcfz_from_vcfc
        from vcfc_tpu.query.engine import query_full_scan

        vcfc = self._vcfc()
        z = vcfz_from_vcfc(vcfc, version=version)
        assert decompress_vcfz(z) == decompress_bytes(vcfc)
        q = parse_coordinate_string("1:1000-9000")
        want = b"".join(query_full_scan(vcfc, q))
        assert b"".join(query_vcfz(z, q)) == want

    def test_v3_smaller_than_v2(self):
        from test_fuzz import make_vcf
        from vcfc_tpu.format import compress_bytes
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        vcfc = compress_bytes(make_vcf(503, 400, 400))
        assert len(vcfz_from_vcfc(vcfc, version=3)) < len(vcfz_from_vcfc(vcfc, version=2))


class TestVcfzV4:
    """Vertical prediction (.vcfz v4): residuals against the previous
    variant line with MATCH-run symbols."""

    def _correlated_vcfc(self, samples=150, variants=600, mu=0.03):
        from vcfc_tpu.eval.random_vcf import generate_correlated_vcf
        from vcfc_tpu.format import compress_bytes

        return compress_bytes(
            generate_correlated_vcf(samples, variants, mutation_rate=mu, seed=11)
        )

    def test_v4_beats_v3_on_correlated_data(self):
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        vcfc = self._correlated_vcfc(300, 1000)
        z3 = vcfz_from_vcfc(vcfc, version=3)
        z4 = vcfz_from_vcfc(vcfc, version=4)
        # measured 2.4x smaller on the 50 MB mu=0.03 cohort (codebook
        # tables dilute the margin at test scale: 0.65 here)
        assert len(z4) < 0.75 * len(z3)

    def test_v4_roundtrip_correlated(self):
        from vcfc_tpu.format import decompress_bytes
        from vcfc_tpu.format.vcfz import decompress_vcfz, vcfz_from_vcfc

        vcfc = self._correlated_vcfc()
        assert decompress_vcfz(vcfz_from_vcfc(vcfc, version=4)) == decompress_bytes(vcfc)

    def test_v4_default_block_height(self):
        """v4's default block height is 64 (r2 #7: a point query decodes
        from the block start to the hit row, so the block height bounds
        the p99 tail); v3 keeps 256.  The native writer hard-codes the
        same pair — byte equality with defaults is asserted in
        test_native_cli / test_distributed."""
        from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc

        vcfc = self._correlated_vcfc(300, 400)
        assert VcfzReader.parse(vcfz_from_vcfc(vcfc, version=4)).block_lines == 64
        assert VcfzReader.parse(vcfz_from_vcfc(vcfc, version=3)).block_lines == 256

    def test_v4_block_boundaries_literal(self):
        # tiny blocks: every block's first line must decode standalone
        from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc

        vcfc = self._correlated_vcfc(40, 50)
        z = vcfz_from_vcfc(vcfc, version=4, block_lines=7)
        r = VcfzReader.parse(z)
        assert r.to_vcfc() == vcfc
        # single mid-file block decodes without its predecessors
        assert b"".join(r.block_lines_vcfc(3)) in vcfc

    def test_v4_numpy_fallback_bytes_identical(self, monkeypatch):
        from vcfc_tpu.format.vcfz import vcfz_from_vcfc

        vcfc = self._correlated_vcfc(60, 80)
        z_native = vcfz_from_vcfc(vcfc, version=4)
        monkeypatch.setenv("VCFC_NO_NATIVE", "1")
        assert vcfz_from_vcfc(vcfc, version=4) == z_native

    def test_v4_escapes_never_match(self):
        # identical escape GTs on consecutive lines must stay literal
        from vcfc_tpu.format import compress_bytes, decompress_bytes
        from vcfc_tpu.format.vcfz import decompress_vcfz, vcfz_from_vcfc

        rows = []
        rows.append(b"##fileformat=VCFv4.2\n")
        rows.append(b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\tC\n")
        for i in range(6):
            gts = [b"2|0", b"0|0", b"2|0"] if i % 2 == 0 else [b"2|0", b"0|1", b"2|0"]
            rows.append(
                b"\t".join([b"1", str(1000 + i).encode(), b".", b"A", b"T", b".",
                            b".", b".", b"GT", *gts]) + b"\n"
            )
        vcf = b"".join(rows)
        vcfc = compress_bytes(vcf)
        z4 = vcfz_from_vcfc(vcfc, version=4)
        assert decompress_vcfz(z4) == vcf

    def test_v4_rejects_non_greedy_input(self):
        """A valid-but-non-canonical .vcfc (ten 0|0s as [0x05, 0x05])
        would be silently canonicalized by the v4 re-emission; both the
        Python and native writers must reject it instead (v1-v3 transcode
        it byte-exactly)."""
        import numpy as np

        from vcfc_tpu.format.headers import encode_length_header
        from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc

        header = b"##m=1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" + \
            b"".join(b"\tS%d" % i for i in range(10)) + b"\n"
        req = b"1\t100\t.\tA\tT\t.\t.\t.\tGT\t"
        body = bytes([0x05, 0x05])  # non-greedy: 5+5 instead of 0x0A
        line = encode_length_header(4 + len(req) + len(body) + 1) + \
            encode_length_header(len(req)) + req + body + b"\n"
        vcfc = header + line
        z3 = vcfz_from_vcfc(vcfc, version=3)  # v3 is byte-exact on it
        assert VcfzReader.parse(z3).to_vcfc() == vcfc
        with pytest.raises(ValueError, match="non-greedy"):
            vcfz_from_vcfc(vcfc, version=4)

        from vcfc_tpu.host.native import cli_path

        if cli_path() is not None:
            import subprocess
            import tempfile

            with tempfile.TemporaryDirectory() as d:
                src = f"{d}/ng.vcfc"
                open(src, "wb").write(vcfc)
                r = subprocess.run(
                    [cli_path(), "compress-z", src, f"{d}/ng.vcfz", "4"],
                    capture_output=True,
                )
                assert r.returncode != 0 and b"non-greedy" in r.stderr

    def test_corrupt_containers_rejected(self):
        """Crafted containers must die cleanly, not decode garbage."""
        import numpy as np

        from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc
        from vcfc_tpu.ops.huffman import Codebook

        vcfc = self._correlated_vcfc(40, 60)
        z = bytearray(vcfz_from_vcfc(vcfc, version=4))
        r = VcfzReader.parse(bytes(z))
        # zero-symbol line: nsym table starts right after req_lens
        nsym_off = bytes(z).find(r.req_lens.astype(np.uint32).tobytes())
        nsym_off += 4 * r.n_lines  # past req_lens into nsym
        corrupt = bytearray(z)
        corrupt[nsym_off : nsym_off + 4] = (0).to_bytes(4, "little")
        with pytest.raises(ValueError):
            VcfzReader.parse(bytes(corrupt)).to_vcfc()
        # Kraft-violating codebook length table
        with pytest.raises(ValueError, match="Kraft"):
            Codebook.from_lengths(np.full(300, 8, np.uint8))

    def test_corrupt_structure_fields_rejected(self):
        """Alphabet size, block-table coverage, and symbol counts are
        validated against what the header implies — a corrupt container
        must raise, never silently truncate or over-allocate."""
        import struct

        import numpy as np

        from vcfc_tpu.format.vcfz import MAGIC, VcfzReader, vcfz_from_vcfc

        vcfc = self._correlated_vcfc(40, 60)
        z = bytes(vcfz_from_vcfc(vcfc, version=3))
        r = VcfzReader.parse(z)

        def patched(off, fmt, value):
            b = bytearray(z)
            struct.pack_into(fmt, b, off, value)
            return bytes(b)

        # n_symbols field sits after magic+9, L/S (12), header blob (8+len),
        # escape table
        off = len(MAGIC) + 9 + 12 + 8 + len(r.header_blob) + 4
        for e in r.escapes:
            off += 2 + len(e)
        with pytest.raises(ValueError, match="alphabet"):
            VcfzReader.parse(patched(off, "<I", 10_000))
        # block_lines field (after magic + version u32 + max_len u8)
        with pytest.raises(ValueError, match="block_lines|cover"):
            VcfzReader.parse(patched(len(MAGIC) + 5, "<I", 0))
        # per-block symbol count beyond payload capacity
        blk0 = dict(r.blocks[0])
        r.blocks[0]["n_symbols"] = 8 * blk0["payload_len"] + 1
        with pytest.raises(ValueError, match="payload capacity"):
            r._decode_block_symbols(0)

    def test_manifest_size_validated(self):
        from vcfc_tpu.index.manifest import Manifest, build_manifest

        vcfc = self._correlated_vcfc(20, 30)
        m = build_manifest(vcfc)
        with pytest.raises(ValueError, match="corrupt .vcfcm"):
            Manifest(m[:-5])

    def test_corrupt_length_header_pair_rejected(self):
        """required_length >= line_length-4 must raise in the numpy
        fallback parser (a negative frombuffer count means read-to-EOF)."""
        from vcfc_tpu.format.headers import encode_length_header
        from vcfc_tpu.format.lines import VcfValidationError
        from vcfc_tpu.host.assemble import parse_vcfc_bytes

        vcfc = bytearray(self._correlated_vcfc(10, 10))
        from vcfc_tpu.format.vcf import parse_metadata_headers

        h = parse_metadata_headers(bytes(vcfc))
        off = h.data_offset
        # make header #2 exceed header #1 - 5
        vcfc[off + 4 : off + 8] = encode_length_header(10**6)
        with pytest.raises(VcfValidationError, match="exceeds line length"):
            parse_vcfc_bytes(bytes(vcfc))

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_v4_transform_inverse_property(self, seed):
        """Property: _v4_block_to_v3(_v4_transform_block(x)) == x for
        arbitrary random code matrices (incl. escapes and runs straddling
        the 127/31 caps), independent of any VCF corpus."""
        import numpy as np

        from vcfc_tpu.format.vcfz import (
            _emit_row_symbols,
            _expand_block_rows,
            _v4_block_to_v3,
            _v4_transform_block,
        )

        rng = np.random.default_rng(seed)
        n, S = 17, int(rng.integers(1, 400))
        codes = rng.choice(5, size=(n, S), p=[0.5, 0.15, 0.15, 0.1, 0.1]).astype(np.uint8)
        # rows with long uniform stretches exercise cap splitting
        codes[3, :] = 0
        codes[4, : S // 2] = 1
        n_esc = 8
        esc_grid = np.where(
            codes == 4, rng.integers(0, n_esc, size=(n, S)), -1
        ).astype(np.int32)
        v3_syms, v3_nsym = _emit_row_symbols(codes, esc_grid, m_base=0)
        m_base = 256 + n_esc
        v4_syms, v4_nsym = _v4_transform_block(v3_syms, v3_nsym, S, m_base)
        back_syms, back_nsym = _v4_block_to_v3(v4_syms, v4_nsym, S, m_base)
        np.testing.assert_array_equal(back_syms, v3_syms)
        np.testing.assert_array_equal(back_nsym, v3_nsym)
        # and the rows themselves survive
        rows2, esc2 = _expand_block_rows(back_syms, back_nsym, S)
        np.testing.assert_array_equal(rows2, codes)
        np.testing.assert_array_equal(esc2, esc_grid)

    def test_v4_cli_and_native_reader(self, tmp_path):
        import subprocess
        import sys

        from vcfc_tpu.format import decompress_bytes
        from vcfc_tpu.format.vcfz import query_vcfz, vcfz_from_vcfc
        from vcfc_tpu.host.native import cli_path
        from vcfc_tpu.query.coordinate import parse_coordinate_string

        vcfc = self._correlated_vcfc(50, 60)
        src = tmp_path / "c.vcfc"
        src.write_bytes(vcfc)
        z4 = tmp_path / "c.vcfz"
        r = subprocess.run(
            [sys.executable, "-m", "vcfc_tpu.cli", "compress-z", str(src), str(z4), "4"],
            capture_output=True,
        )
        assert r.returncode == 0, r.stderr
        assert z4.read_bytes()[:4] == b"VCFZ"
        if cli_path() is not None:
            # the native CLI WRITES v4 byte-identically to Python
            z4n = tmp_path / "n.vcfz"
            rw = subprocess.run(
                [cli_path(), "compress-z", str(src), str(z4n), "4"],
                capture_output=True,
            )
            assert rw.returncode == 0, rw.stderr
            assert z4n.read_bytes() == vcfz_from_vcfc(vcfc, version=4)
            # and reads v4 too: decompress + query byte-equal
            out = tmp_path / "o.vcf"
            rr = subprocess.run(
                [cli_path(), "decompress-z", str(z4), str(out)], capture_output=True
            )
            assert rr.returncode == 0, rr.stderr
            assert out.read_bytes() == decompress_bytes(vcfc)
            region = "1:10000-10060"
            q = parse_coordinate_string(region)
            want = b"".join(query_vcfz(z4.read_bytes(), q))
            rq = subprocess.run(
                [cli_path(), "query-z", str(z4), region], capture_output=True
            )
            assert rq.returncode == 0 and rq.stdout == want
