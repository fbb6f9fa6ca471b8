"""Device-side Huffman DECODE (ops/huffman_device.py) and the order-0
`.vcfz` v5 container it exists for.

The decode kernel is the gather-free bit-parallel formulation: per-bit
code lengths from canonical limits (arithmetic), symbol-start
reachability as a two-level boolean transfer-matrix scan, host-side
O(symbols) compaction.  Every stream it accepts must decode to exactly
the bytes the host/native decoders produce.
"""

import numpy as np
import pytest

from vcfc_tpu.format import compress_bytes, decompress_bytes
from vcfc_tpu.format.vcfz import VcfzReader, decompress_vcfz, vcfz_from_vcfc
from vcfc_tpu.format.vcfz_device import vcfz_to_vcfc_device
from vcfc_tpu.ops.huffman import Codebook, pack_symbols
from vcfc_tpu.ops.huffman_device import device_unpack_symbols


def _vcfc(seed=34, samples=70, variants=200, sv_every=6):
    from test_fuzz import make_vcf

    return compress_bytes(make_vcf(seed, samples, variants, sv_every=sv_every))


class TestDecodeKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_streams_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        A = int(rng.integers(5, 400))
        freqs = rng.integers(0, 1000, A)
        freqs[int(rng.integers(0, A))] += 100000  # skew: short codes appear
        book = Codebook.from_frequencies(freqs)
        present = np.flatnonzero(book.lengths)
        streams = [
            rng.choice(present, size=int(rng.integers(1, 5000)))
            for _ in range(7)
        ]
        payloads = [pack_symbols(s.astype(np.int64), book)[0] for s in streams]
        got = device_unpack_symbols(payloads, [len(s) for s in streams], book)
        for g, s in zip(got, streams):
            np.testing.assert_array_equal(g, s)

    def test_single_symbol_alphabet(self):
        book = Codebook.from_frequencies(np.array([0, 9]))
        stream = np.ones(100, np.int64)
        payload, _ = pack_symbols(stream, book)
        (got,) = device_unpack_symbols([payload], [100], book)
        np.testing.assert_array_equal(got, stream)

    def test_truncated_stream_raises(self):
        book = Codebook.from_frequencies(np.arange(1, 40))
        stream = np.arange(30, dtype=np.int64) % 39
        payload, _ = pack_symbols(stream, book)
        with pytest.raises(ValueError, match="invalid Huffman"):
            device_unpack_symbols([payload[: len(payload) // 4]], [30], book)

    def test_word_boundary_straddles(self):
        """Codes that repeatedly straddle 32-bit word boundaries (7-bit
        uniform codes) must chain exactly."""
        lengths = np.zeros(130, np.uint8)
        lengths[1:129] = 7
        book = Codebook.from_lengths(lengths)
        stream = (np.arange(997) % 128 + 1).astype(np.int64)
        payload, _ = pack_symbols(stream, book)
        (got,) = device_unpack_symbols([payload], [len(stream)], book)
        np.testing.assert_array_equal(got, stream)


class TestVcfzV5:
    def test_roundtrip_and_query(self):
        from vcfc_tpu.format.vcfz import query_vcfz
        from vcfc_tpu.query.coordinate import parse_coordinate_string
        from vcfc_tpu.query.engine import query_full_scan

        vcfc = _vcfc()
        z5 = vcfz_from_vcfc(vcfc, version=5)
        assert decompress_vcfz(z5) == decompress_bytes(vcfc)
        q = parse_coordinate_string("1:1000-9000")
        assert b"".join(query_vcfz(z5, q)) == b"".join(query_full_scan(vcfc, q))

    def test_one_book_plus_req_book(self):
        r = VcfzReader.parse(vcfz_from_vcfc(_vcfc(), version=5))
        assert r.version == 5 and len(r.books) == 1
        assert r.req_book is not None

    def test_smaller_than_v1(self):
        # v5 = v1's order-0 symbol coding + v3's coded required columns
        vcfc = _vcfc(35, 120, 400)
        assert len(vcfz_from_vcfc(vcfc, version=5)) < len(
            vcfz_from_vcfc(vcfc, version=1)
        )

    def test_device_writer_byte_identical(self):
        vcfc = _vcfc(36)
        assert vcfz_from_vcfc(vcfc, version=5, route="device") == vcfz_from_vcfc(
            vcfc, version=5
        )

    def test_native_writer_and_reader(self, tmp_path):
        import subprocess

        from vcfc_tpu.host.native import cli_path

        if cli_path() is None:
            pytest.skip("native CLI unavailable")
        vcfc = _vcfc(37)
        src = tmp_path / "a.vcfc"
        src.write_bytes(vcfc)
        z = tmp_path / "a.vcfz"
        r = subprocess.run(
            [cli_path(), "compress-z", str(src), str(z), "5"], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        assert z.read_bytes() == vcfz_from_vcfc(vcfc, version=5)
        out = tmp_path / "a.vcf"
        r = subprocess.run(
            [cli_path(), "decompress-z", str(z), str(out)], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        assert out.read_bytes() == decompress_bytes(vcfc)


class TestDeviceDecodeRoute:
    @pytest.mark.parametrize("version", [1, 5, 6])
    def test_order0_containers_decode_on_device(self, version):
        vcfc = _vcfc(38, 90, 400)
        z = vcfz_from_vcfc(vcfc, version=version, block_lines=32)
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_ctx_containers_fall_back(self):
        vcfc = _vcfc(39)
        for version in (2, 3):  # v5/v6 are the order-0 device twins
            z = vcfz_from_vcfc(vcfc, version=version)
            assert vcfz_to_vcfc_device(z) is None
            # the public entry still decompresses via the host path
            assert decompress_vcfz(z, route="device") == decompress_bytes(vcfc)

    def test_v4_resolves_on_device(self):
        """v4's symbol payloads are context-coded (host entropy decode)
        but its vertical-match resolve rides the device middle — the
        route must reconstruct the .vcfc byte-for-byte."""
        vcfc = _vcfc(43, 90, 400)
        for block_lines in (1, 7, 32):
            z = vcfz_from_vcfc(vcfc, version=4, block_lines=block_lines)
            assert vcfz_to_vcfc_device(z) == vcfc

    def test_env_gate(self, monkeypatch):
        vcfc = _vcfc(40)
        z = vcfz_from_vcfc(vcfc, version=5)
        monkeypatch.setenv("VCFZ_PACK", "device")
        assert decompress_vcfz(z) == decompress_bytes(vcfc)

    def test_full_device_cycle(self):
        """Encode on device, decode on device: entropy coding never
        leaves the chip for the v5 container."""
        vcfc = _vcfc(41, 60, 300)
        z = vcfz_from_vcfc(vcfc, version=5, route="device")
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_corrupt_payload_raises(self):
        """An all-ones payload chains into windows past the book's last
        canonical limit — ordinals out of range must raise, not decode
        garbage.  (All-ZERO corruption decodes as a run of the
        lexicographically first codeword on the host decoders too — both
        routes agree on that; the device gate matches the host's
        'invalid Huffman stream' semantics where detection is possible.)"""
        vcfc = _vcfc(42, 40, 120)
        z = bytearray(vcfz_from_vcfc(vcfc, version=5))
        r = VcfzReader.parse(bytes(z))
        assert int(r.books[0].lengths.max()) < 15  # 0xFF windows are invalid
        blk = r.blocks[0]
        start = r.payload_base + blk["payload_off"]
        z[start : start + blk["payload_len"]] = b"\xff" * blk["payload_len"]
        with pytest.raises(ValueError, match="invalid Huffman"):
            vcfz_to_vcfc_device(bytes(z))

    def test_truncated_stream_gate_under_device_compact(self, monkeypatch):
        """VCFZ_COMPACT=device masks each stream's positional plane to
        its true bit length before compacting, so a truncated payload
        still dies with 'invalid Huffman stream' — spurious starts in
        the zero padding beyond the stream must not satisfy the symbol
        count."""
        from vcfc_tpu.ops.huffman_device import device_unpack_symbols

        vcfc = _vcfc(44, 40, 120)
        z = vcfz_from_vcfc(vcfc, version=5)
        r = VcfzReader.parse(z)
        blk = r.blocks[0]
        start = r.payload_base + blk["payload_off"]
        payload = bytes(r.raw[start : start + blk["payload_len"]])
        n = int(blk["n_symbols"])
        monkeypatch.setenv("VCFZ_COMPACT", "device")
        with pytest.raises(ValueError, match="invalid Huffman"):
            device_unpack_symbols([payload[: len(payload) // 2]], [n], r.books[0])
        # the untruncated stream still decodes under the flag
        syms = device_unpack_symbols([payload], [n], r.books[0])[0]
        assert len(syms) == n

    def test_device_compact_matches_host_compact(self, monkeypatch):
        vcfc = _vcfc(45, 70, 350)
        for version in (1, 5, 6):
            zc = vcfz_from_vcfc(vcfc, version=version, block_lines=32)
            monkeypatch.setenv("VCFZ_COMPACT", "device")
            assert vcfz_to_vcfc_device(zc) == vcfc
            monkeypatch.delenv("VCFZ_COMPACT")


class TestVcfzV6:
    """v6 = v4's vertical prediction + v5's single order-0 book: the
    device-decodable container for LD-correlated cohorts."""

    def _corr_vcfc(self, samples=150, variants=500):
        from vcfc_tpu.eval.random_vcf import generate_correlated_vcf

        return compress_bytes(
            generate_correlated_vcf(
                samples, variants, mutation_rate=0.03, seed=13
            )
        )

    def test_roundtrip_blocks_and_band(self):
        vcfc = self._corr_vcfc()
        z = vcfz_from_vcfc(vcfc, version=6)
        r = VcfzReader.parse(z)
        assert r.version == 6 and len(r.books) == 1
        assert r.block_lines == 64  # v4's tail-bounding default
        assert decompress_vcfz(z) == decompress_bytes(vcfc)

    def test_beats_v5_on_correlated_data(self):
        """Vertical prediction must carry over: on LD-correlated data v6
        lands far below the literal order-0 v5."""
        vcfc = self._corr_vcfc(300, 900)
        z5 = vcfz_from_vcfc(vcfc, version=5)
        z6 = vcfz_from_vcfc(vcfc, version=6)
        assert len(z6) < 0.8 * len(z5)

    def test_device_cycle(self):
        vcfc = self._corr_vcfc()
        z = vcfz_from_vcfc(vcfc, version=6, route="device")
        assert z == vcfz_from_vcfc(vcfc, version=6)
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_rejects_non_greedy_like_v4(self):
        from vcfc_tpu.format.headers import encode_length_header

        header = (
            b"##m=1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
            + b"".join(b"\tS%d" % i for i in range(10))
            + b"\n"
        )
        req = b"1\t100\t.\tA\tT\t.\t.\t.\tGT\t"
        body = bytes([0x05, 0x05])
        line = (
            encode_length_header(4 + len(req) + len(body) + 1)
            + encode_length_header(len(req))
            + req
            + body
            + b"\n"
        )
        with pytest.raises(ValueError, match="non-greedy"):
            vcfz_from_vcfc(header + line, version=6)


class TestDeviceResolve:
    """The v4/v6 vertical-match resolve middle
    (format/vcfz_device.py::_resolve_blocks_device ->
    ops/vcfz_device.py::resolve_match_grid): device output must equal
    the host resolve (_v4_block_to_v3 + _emit_row_symbols) stream for
    stream."""

    @pytest.mark.parametrize("seed", [60, 61, 62])
    def test_kernel_matches_host_resolve(self, seed):
        from vcfc_tpu.format.vcfz import (
            _emit_row_symbols,
            _expand_block_rows,
            _v4_block_to_v3,
            _v4_transform_block,
        )
        from vcfc_tpu.format.vcfz_device import (
            _block_classpos,
            _resolve_blocks_device,
        )
        from vcfc_tpu.ops.vcfz_device import resolve_match_grid
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        S = int(rng.integers(3, 200))
        n = int(rng.integers(1, 40))
        m_base = 256 + 5
        # random v3 rows (codes 0-4) with vertical correlation, then the
        # host transform produces a valid v4 stream to resolve back
        rows = rng.choice(5, p=[0.5, 0.15, 0.1, 0.1, 0.15], size=(n, S))
        for i in range(1, n):
            keep = rng.random(S) < 0.6
            rows[i][keep] = rows[i - 1][keep]
        esc_grid = np.where(rows == 4, rng.integers(0, 5, size=(n, S)), -1)
        v3_syms, v3_nsym = _emit_row_symbols(rows.astype(np.uint8), esc_grid, m_base)
        v4_syms, v4_nsym = _v4_transform_block(v3_syms, v3_nsym, S, m_base)
        want_syms, want_nsym = _v4_block_to_v3(v4_syms, v4_nsym, S, m_base)

        S_pad = max(-(-S // 128) * 128, 128)
        grid, esc_ids = _block_classpos(v4_syms, v4_nsym, S, S_pad, m_base)
        flagpos, nseg, bad = resolve_match_grid(
            jnp.asarray(grid[None]), S
        )
        assert not bool(np.asarray(bad))
        sub = np.asarray(flagpos)[0, :n, :S]
        lines, cols = np.nonzero(sub)
        got = sub[lines, cols].astype(np.int64)
        got[got == 0xE1] = 256 + esc_ids
        np.testing.assert_array_equal(got, np.asarray(want_syms, np.int64))
        np.testing.assert_array_equal(
            np.bincount(lines, minlength=n), np.asarray(want_nsym, np.int64)
        )

    def test_multi_batch_resolve(self, monkeypatch):
        import vcfc_tpu.format.vcfz_device as fvd

        vcfc = _vcfc(63, 40, 260)
        z = vcfz_from_vcfc(vcfc, version=6, block_lines=16)
        monkeypatch.setattr(fvd, "_MAX_CELLS", 16 * 128)  # 1 block per batch
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_match_in_first_line_raises(self):
        from vcfc_tpu.format.vcfz_device import _block_classpos
        from vcfc_tpu.ops.vcfz_device import resolve_match_grid
        import jax.numpy as jnp

        S, m_base = 12, 256
        grid, _ = _block_classpos(
            np.array([m_base + S], np.int64), np.array([1], np.int64), S, 128, m_base
        )
        _, _, bad = resolve_match_grid(jnp.asarray(grid[None]), S)
        assert bool(np.asarray(bad))

    @pytest.mark.parametrize("samples", [127, 128, 129])
    def test_lane_boundary_widths(self, samples):
        vcfc = _vcfc(64, samples, 70)
        for version in (4, 6):
            z = vcfz_from_vcfc(vcfc, version=version, block_lines=32)
            assert vcfz_to_vcfc_device(z) == vcfc


class TestVcfzV7:
    """v7 = v4's compression (same books, same per-symbol codes, same
    vertical transform) with each block's stream split into per-context
    order-0 sub-payloads — device-decodable at v4's ratio
    (vcfz._split_ctx_streams / _merge_ctx_streams)."""

    def _corr_vcfc(self, samples=150, variants=500):
        from vcfc_tpu.eval.random_vcf import generate_correlated_vcf

        return compress_bytes(
            generate_correlated_vcf(samples, variants, mutation_rate=0.03, seed=17)
        )

    def test_matches_v4_size_within_framing(self):
        vcfc = self._corr_vcfc()
        z4 = vcfz_from_vcfc(vcfc, version=4)
        z7 = vcfz_from_vcfc(vcfc, version=7)
        r = VcfzReader.parse(z7)
        # identical per-symbol codes; only the per-block framing (5+5 u32)
        # and per-sub-payload byte padding (<= 5 B/block) can differ
        assert len(z7) - len(z4) <= len(r.blocks) * (40 + 5)
        assert decompress_vcfz(z7) == decompress_bytes(vcfc)

    def test_beats_v6_on_correlated_data(self):
        # big enough that the 4 extra serialized codebooks (~4*(257+S)
        # length bytes) amortize: the context-coding win scales with the
        # payload, the framing is fixed per book/block.  At 503 MB the
        # gap is ~13% (BASELINE.md matrix); here it's a few percent.
        vcfc = self._corr_vcfc(300, 2400)
        z6 = vcfz_from_vcfc(vcfc, version=6)
        z7 = vcfz_from_vcfc(vcfc, version=7)
        assert len(z7) < len(z6)  # context books win, framing is tiny

    def test_full_device_cycle(self):
        vcfc = self._corr_vcfc()
        z = vcfz_from_vcfc(vcfc, version=7, route="device")
        assert z == vcfz_from_vcfc(vcfc, version=7)
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_merge_underrun_raises(self):
        from vcfc_tpu.format.vcfz import _merge_ctx_streams
        import numpy as np

        classes = np.zeros(300, np.uint8)  # every symbol -> ctx 0
        subs = [np.array([1], np.int64)] + [np.array([2], np.int64)] * 4
        # total says 5 but ctx 0 holds only one symbol -> clean error
        with pytest.raises(ValueError, match="underrun|do not sum"):
            _merge_ctx_streams(subs, classes, 5)

    def test_native_writer_and_reader(self, tmp_path):
        import subprocess

        from vcfc_tpu.host.native import cli_path

        if cli_path() is None:
            pytest.skip("native CLI unavailable")
        vcfc = _vcfc(44)
        src = tmp_path / "a.vcfc"
        src.write_bytes(vcfc)
        z = tmp_path / "a.vcfz"
        r = subprocess.run(
            [cli_path(), "compress-z", str(src), str(z), "7"], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        assert z.read_bytes() == vcfz_from_vcfc(vcfc, version=7)
        out = tmp_path / "a.vcf"
        r = subprocess.run(
            [cli_path(), "decompress-z", str(z), str(out)], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        assert out.read_bytes() == decompress_bytes(vcfc)


class TestVcfzV8:
    """v8 = v3's compression (same literal streams, same context books,
    same per-symbol codes — no vertical transform) with each block's
    stream split into per-context order-0 sub-payloads — device-
    decodable at v3's ratio, retiring v5's order-0 tax on uncorrelated
    data (the last cell of the {literal, vertical} x {context, order-0,
    split} matrix)."""

    def test_matches_v3_size_within_framing(self):
        vcfc = _vcfc(91, 120, 400)
        z3 = vcfz_from_vcfc(vcfc, version=3)
        z8 = vcfz_from_vcfc(vcfc, version=8)
        r = VcfzReader.parse(z8)
        # identical per-symbol codes; only the per-block framing (4+4 u32)
        # and per-sub-payload byte padding (<= 4 B/block) can differ
        assert len(z8) - len(z3) <= len(r.blocks) * (32 + 4)
        assert decompress_vcfz(z8) == decompress_bytes(vcfc)

    def test_beats_v5_on_uncorrelated_data(self):
        # v5 pays the order-0 tax for device decodability; v8 keeps v3's
        # context coding AND device-decodes — it must win on any cohort
        # big enough to amortize the 3 extra codebooks + block framing
        vcfc = _vcfc(92, 200, 900)
        z5 = vcfz_from_vcfc(vcfc, version=5)
        z8 = vcfz_from_vcfc(vcfc, version=8)
        assert len(z8) < len(z5)

    def test_full_device_cycle(self):
        vcfc = _vcfc(93, 100, 300)
        z = vcfz_from_vcfc(vcfc, version=8, route="device")
        assert z == vcfz_from_vcfc(vcfc, version=8)
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_non_greedy_transcodes_byte_exact(self):
        """v8 has no re-emission (literal streams come straight from the
        flag bytes), so non-canonical runs survive the roundtrip exactly
        like v3 — no greedy guard."""
        from vcfc_tpu.format.headers import encode_length_header

        header = (
            b"##m=1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
            + b"".join(b"\tS%d" % i for i in range(10))
            + b"\n"
        )
        req = b"1\t100\t.\tA\tT\t.\t.\t.\tGT\t"
        body = bytes([0x05, 0x05])  # non-greedy: 5+5 instead of 0x0A
        line = (
            encode_length_header(4 + len(req) + len(body) + 1)
            + encode_length_header(len(req))
            + req
            + body
            + b"\n"
        )
        vcfc = header + line
        z = vcfz_from_vcfc(vcfc, version=8)
        assert VcfzReader.parse(z).to_vcfc() == vcfc

    def test_native_writer_and_reader(self, tmp_path):
        import subprocess

        from vcfc_tpu.host.native import cli_path

        if cli_path() is None:
            pytest.skip("native CLI unavailable")
        vcfc = _vcfc(45)
        src = tmp_path / "a.vcfc"
        src.write_bytes(vcfc)
        z = tmp_path / "a.vcfz"
        r = subprocess.run(
            [cli_path(), "compress-z", str(src), str(z), "8"], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        assert z.read_bytes() == vcfz_from_vcfc(vcfc, version=8)
        out = tmp_path / "a.vcf"
        r = subprocess.run(
            [cli_path(), "decompress-z", str(z), str(out)], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        assert out.read_bytes() == decompress_bytes(vcfc)
