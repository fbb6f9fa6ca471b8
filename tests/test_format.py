"""Conformance tests for the byte contract: golden-bytes equality against
fixtures produced by the reference binary (vendored in tests/data)."""

import pytest

from vcfc_tpu.format import (
    VcfValidationError,
    compress_bytes,
    decode_data_line,
    decode_length_header,
    decompress_bytes,
    encode_data_line,
    encode_length_header,
    parse_metadata_headers,
)


class TestLengthHeader:
    def test_roundtrip(self):
        for v in [0, 1, 42, 127, 1 << 20, 0x3FFFFFFF]:
            assert decode_length_header(encode_length_header(v)) == v

    def test_flag_bits(self):
        assert encode_length_header(0)[0] == 0xC0
        assert encode_length_header(0x3FFFFFFF) == b"\xff\xff\xff\xff"

    def test_too_large(self):
        with pytest.raises(ValueError):
            encode_length_header(0x40000000)

    def test_bad_extension_count(self):
        with pytest.raises(ValueError):
            decode_length_header(b"\x00\x00\x00\x05")


class TestGoldenBytes:
    def test_compress_small_matches_reference(self, small_vcf, small_vcfc):
        assert compress_bytes(small_vcf) == small_vcfc

    def test_decompress_small_matches_reference(self, small_vcf, small_vcfc):
        assert decompress_bytes(small_vcfc) == small_vcf

    def test_compress_sv_matches_reference(self, sv_vcf, sv_vcfc):
        assert compress_bytes(sv_vcf) == sv_vcfc

    def test_decompress_sv_matches_reference(self, sv_vcf, sv_vcfc):
        assert decompress_bytes(sv_vcfc) == sv_vcf


class TestLineCodec:
    def _roundtrip(self, line: bytes, sample_count: int):
        enc = encode_data_line(line)
        dec, consumed = decode_data_line(enc, 0, sample_count)
        assert consumed == len(enc)
        assert dec == line + b"\n"
        return enc

    def test_all_00(self):
        line = b"\t".join([b"1", b"100", b"id", b"A", b"T", b"50", b"PASS", b".", b"GT"] + [b"0|0"] * 5)
        enc = self._roundtrip(line, 5)
        # one flag byte for the run of five 0|0
        assert enc[-2] == 5

    def test_run_cap_00(self):
        # 300 copies of 0|0 must split 127+127+46 (compress.cpp:126)
        line = b"\t".join([b"1", b"100", b"i", b"A", b"T", b".", b".", b".", b"GT"] + [b"0|0"] * 300)
        enc = self._roundtrip(line, 300)
        flags = enc[:-1][-3:]
        assert list(flags) == [127, 127, 46]

    def test_run_cap_het(self):
        # 40 copies of 1|1 must split 31+9 with mask 0x80 (compress.cpp:127)
        line = b"\t".join([b"1", b"100", b"i", b"A", b"T", b".", b".", b".", b"GT"] + [b"1|1"] * 40)
        enc = self._roundtrip(line, 40)
        flags = enc[:-1][-2:]
        assert list(flags) == [0x80 | 31, 0x80 | 9]

    def test_het_masks(self):
        line = b"\t".join([b"1", b"1", b"i", b"A", b"T", b".", b".", b".", b"GT", b"0|1", b"1|0", b"1|1"])
        enc = self._roundtrip(line, 3)
        assert list(enc[-4:-1]) == [0xA0 | 1, 0xC0 | 1, 0x80 | 1]

    def test_escape_mid_and_last(self):
        line = b"\t".join([b"1", b"1", b"i", b"A", b"T", b".", b".", b".", b"GT", b"2|0", b"0|0", b"2|2"])
        enc = self._roundtrip(line, 3)
        # escape mid-line carries a trailing tab; last sample does not
        tail = enc[8:]
        assert b"\xe1" + b"2|0" + b"\t" in tail
        assert tail.endswith(b"\xe1" + b"2|2" + b"\n")

    def test_missing_gt(self):
        line = b"\t".join([b"1", b"1", b"i", b"A", b"T", b".", b".", b".", b"GT", b"./.", b"0|0"])
        self._roundtrip(line, 2)

    def test_no_samples_with_format(self):
        # 9 columns (FORMAT, zero samples): 8 tabs, accepted when
        # sample_count == 0 (compress.cpp:820-828)
        line = b"\t".join([b"1", b"1", b"i", b"A", b"T", b".", b".", b".", b"GT"])
        enc = encode_data_line(line)
        dec, consumed = decode_data_line(enc, 0, 0)
        assert dec == line + b"\n"
        assert consumed == len(enc)

    def test_no_format_column_rejected_on_decode(self):
        # The reference's tab-count check rejects 8-column (FORMAT-less)
        # lines even with sample_count == 0 (compress.cpp:820-828).
        line = b"\t".join([b"1", b"1", b"i", b"A", b"T", b".", b".", b"."])
        enc = encode_data_line(line)
        with pytest.raises(VcfValidationError):
            decode_data_line(enc, 0, 0)

    def test_too_few_columns(self):
        with pytest.raises(VcfValidationError):
            encode_data_line(b"1\t2\t3")

    def test_truncated_decode(self):
        enc = encode_data_line(
            b"\t".join([b"1", b"1", b"i", b"A", b"T", b".", b".", b".", b"GT", b"0|0"])
        )
        with pytest.raises(VcfValidationError):
            decode_data_line(enc[:-2], 0, 1)


class TestMetadataHeaders:
    def test_parse(self, small_vcfc):
        h = parse_metadata_headers(small_vcfc)
        assert len(h.meta_lines) == 3
        assert h.header_line.startswith(b"#CHROM")
        assert h.schema.sample_count == 100

    def test_header_without_meta_rejected(self):
        with pytest.raises(VcfValidationError):
            parse_metadata_headers(b"#CHROM\tPOS\nXXXX")

    def test_data_before_header_rejected(self):
        with pytest.raises(VcfValidationError):
            parse_metadata_headers(b"1\t100\tfoo\n")
