"""Device-route `.vcfz` writer (ops/vcfz_device + format/vcfz_device).

The byte contract (CLAUDE.md): the device route must produce containers
byte-identical to the host writer for every version, on every input it
accepts; inputs it cannot handle fall back to the host path inside
vcfz_from_vcfc (never an error, never different bytes).
"""

import numpy as np
import pytest

from vcfc_tpu.format import compress_bytes
from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc
from vcfc_tpu.format.vcfz_device import vcfz_from_vcfc_device


def _fuzz_vcfc(seed=501, samples=70, variants=90, sv_every=8):
    from test_fuzz import make_vcf

    return compress_bytes(make_vcf(seed, samples, variants, sv_every=sv_every))


def _correlated_vcfc(samples=120, variants=300, mu=0.03):
    from vcfc_tpu.eval.random_vcf import generate_correlated_vcf

    return compress_bytes(
        generate_correlated_vcf(samples, variants, mutation_rate=mu, seed=11)
    )


class TestDeviceRouteBytes:
    @pytest.mark.parametrize("version", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_byte_identical_to_host(self, version):
        vcfc = _fuzz_vcfc()
        host = vcfz_from_vcfc(vcfc, version=version)
        dev = vcfz_from_vcfc(vcfc, version=version, route="device")
        assert dev == host

    @pytest.mark.parametrize("block_lines", [7, 64])
    def test_correlated_v4_byte_identical(self, block_lines):
        vcfc = _correlated_vcfc()
        host = vcfz_from_vcfc(vcfc, block_lines=block_lines, version=4)
        dev = vcfz_from_vcfc(
            vcfc, block_lines=block_lines, version=4, route="device"
        )
        assert dev == host
        assert VcfzReader.parse(dev).to_vcfc() == vcfc

    def test_env_gate_selects_device(self, monkeypatch):
        vcfc = _fuzz_vcfc()
        host = vcfz_from_vcfc(vcfc)
        monkeypatch.setenv("VCFZ_PACK", "device")
        assert vcfz_from_vcfc(vcfc) == host

    def test_escape_first_occurrence_order(self):
        # escapes whose first appearance (z|2 before a|2) differs from
        # sorted order: the device esc-id grid must keep stream order
        rows = [
            ["z|2", "0|0", "a|2", "0|0"],
            ["0|0", "a|2", "0|0", "z|2"],
            ["c|2", "0|0", "0|0", "b|2"],
        ]
        lines = [
            b"##f=1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\tC\tD\n"
        ]
        for i, r in enumerate(rows):
            lines.append(
                b"1\t%d\t.\tA\tT\t9\tPASS\t.\tGT\t" % (100 + i)
                + "\t".join(r).encode()
                + b"\n"
            )
        vcfc = compress_bytes(b"".join(lines))
        for v in (3, 4):
            assert vcfz_from_vcfc(vcfc, version=v, route="device") == vcfz_from_vcfc(
                vcfc, version=v
            )

    def test_non_greedy_v3_exact_v4_rejected(self):
        """v1-v3 transcode non-canonical flag runs byte-exactly on the
        device route too (symbols come from the flags, not a re-emission);
        v4 rejects them exactly like the host writer."""
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
        assert vcfz_from_vcfc(vcfc, version=3, route="device") == vcfz_from_vcfc(
            vcfc, version=3
        )
        with pytest.raises(ValueError, match="non-greedy"):
            vcfz_from_vcfc(vcfc, version=4, route="device")

    def test_fallback_without_native(self, monkeypatch):
        vcfc = _fuzz_vcfc(502, 20, 30)
        want = vcfz_from_vcfc(vcfc)
        monkeypatch.setenv("VCFC_NO_NATIVE", "1")
        assert vcfz_from_vcfc_device(vcfc, 256, 3) is None
        # the public entry falls back to the host writer transparently
        monkeypatch.setenv("VCFZ_PACK", "device")
        assert vcfz_from_vcfc(vcfc) == want

    def test_multi_batch_paths(self, monkeypatch):
        """Force tiny device batches so the batched emission/packing and
        the non-resident re-emission path both run."""
        import vcfc_tpu.format.vcfz_device as zdev

        vcfc = _correlated_vcfc(40, 200)
        want4 = vcfz_from_vcfc(vcfc, block_lines=16, version=4)
        want3 = vcfz_from_vcfc(vcfc, block_lines=16, version=3)
        monkeypatch.setattr(zdev, "_MAX_CELLS", 16 * 128 * 4)  # 4 blocks/batch
        assert vcfz_from_vcfc_device(vcfc, 16, 4) == want4
        monkeypatch.setattr(zdev, "_MAX_RESIDENT_BYTES", 0)  # re-emit in pass 2
        assert vcfz_from_vcfc_device(vcfc, 16, 4) == want4
        assert vcfz_from_vcfc_device(vcfc, 16, 3) == want3


class TestDeviceCompact:
    """VCFZ_COMPACT=device: on-device sort_compact compaction + sparse
    escape-plane scatter (VERDICT r4 #2 — O(outputs) transfers instead
    of dense planes).  Bytes must be identical to BOTH the host-compact
    device route and the host writer."""

    @pytest.mark.parametrize("version", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_encode_byte_identical(self, version, monkeypatch):
        vcfc = _fuzz_vcfc()
        host = vcfz_from_vcfc(vcfc, version=version)
        monkeypatch.setenv("VCFZ_COMPACT", "device")
        assert vcfz_from_vcfc(vcfc, version=version, route="device") == host

    @pytest.mark.parametrize("version", [4, 5, 7, 8])
    def test_decode_roundtrip(self, version, monkeypatch):
        from vcfc_tpu.format.vcfz_device import vcfz_to_vcfc_device

        vcfc = _correlated_vcfc(60, 250)
        z = vcfz_from_vcfc(vcfc, version=version, block_lines=32)
        monkeypatch.setenv("VCFZ_COMPACT", "device")
        assert vcfz_to_vcfc_device(z) == vcfc

    def test_partial_block_and_multi_batch(self, monkeypatch):
        """Tiny batches + a trailing partial block: the bucketed slices,
        pad-row garbage stepping, and per-batch escape scatter all hit
        their edge paths."""
        import vcfc_tpu.format.vcfz_device as zdev
        from vcfc_tpu.format.vcfz_device import vcfz_to_vcfc_device

        vcfc = _fuzz_vcfc(503, 50, 203)  # 203 % 16 != 0
        monkeypatch.setenv("VCFZ_COMPACT", "device")
        monkeypatch.setattr(zdev, "_MAX_CELLS", 16 * 128 * 4)
        for version in (4, 7):
            want = vcfz_from_vcfc(vcfc, block_lines=16, version=version)
            assert vcfz_from_vcfc_device(vcfc, 16, version) == want
            assert vcfz_to_vcfc_device(want) == vcfc

    def test_escape_order_preserved(self, monkeypatch):
        """sort_compact keeps row-major order, so escape ids must still
        rejoin their cells in first-occurrence order."""
        from vcfc_tpu.format.vcfz_device import vcfz_to_vcfc_device

        vcfc = _fuzz_vcfc(504, 30, 60, sv_every=3)  # escape-dense
        monkeypatch.setenv("VCFZ_COMPACT", "device")
        for version in (4, 7, 8):
            host = vcfz_from_vcfc(vcfc, version=version)
            assert vcfz_from_vcfc(vcfc, version=version, route="device") == host
            assert vcfz_to_vcfc_device(host) == vcfc


class TestKernelsVsOracle:
    """Kernel-level equality against the host oracle transforms,
    independent of container assembly."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_symbol_grid_matches_v4_transform(self, seed):
        import jax.numpy as jnp

        from vcfc_tpu.format.vcfz import _emit_row_symbols, _v4_transform_block
        from vcfc_tpu.ops.vcfz_device import compact_symbols, symbol_grid

        rng = np.random.default_rng(seed)
        n, S = 24, int(rng.integers(2, 300))
        codes = rng.choice(
            5, size=(n, S), p=[0.5, 0.15, 0.15, 0.1, 0.1]
        ).astype(np.uint8)
        codes[3, :] = 0  # long uniform rows exercise the 127-cap split
        codes[5] = codes[4]  # guaranteed full-row vertical match
        n_esc = 6
        esc_grid = np.where(
            codes == 4, rng.integers(0, n_esc, size=(n, S)), 0
        ).astype(np.int32)
        esc_oracle = np.where(codes == 4, esc_grid, -1)
        m_base = 256 + n_esc
        block_lines = 8
        v3_syms, v3_nsym = _emit_row_symbols(codes, esc_oracle, m_base=0)

        S_pad = S + 3  # unaligned padding exercises the width mask
        cg = np.zeros((n, S_pad), np.uint8)
        cg[:, :S] = codes
        eg = np.zeros((n, S_pad), np.int32)
        eg[:, :S] = esc_grid
        block_first = (np.arange(n) % block_lines) == 0
        sympos, nsym = symbol_grid(
            jnp.asarray(cg), jnp.asarray(eg), S, jnp.asarray(block_first),
            m_base, v4=True,
        )
        got_syms, got_counts = compact_symbols(np.asarray(sympos))

        ends = np.cumsum(v3_nsym.astype(np.int64))
        want_syms, want_counts = [], []
        for lo in range(0, n, block_lines):
            hi = min(lo + block_lines, n)
            s0 = 0 if lo == 0 else int(ends[lo - 1])
            s4, c4 = _v4_transform_block(
                v3_syms[s0 : int(ends[hi - 1])], v3_nsym[lo:hi], S, m_base
            )
            want_syms.append(s4)
            want_counts.append(c4)
        np.testing.assert_array_equal(got_syms, np.concatenate(want_syms))
        np.testing.assert_array_equal(
            got_counts.astype(np.int64),
            np.concatenate(want_counts).astype(np.int64),
        )

    @pytest.mark.parametrize("n_ctx", [1, 4])
    def test_pack_cells_matches_host_packer(self, n_ctx):
        import jax.numpy as jnp

        from vcfc_tpu.ops.huffman import (
            Codebook,
            context_codebooks,
            pack_symbols,
            pack_symbols_ctx,
            symbol_classes,
        )
        from vcfc_tpu.ops.vcfz_device import (
            compact_payloads,
            pack_cells,
            pack_entries,
        )
        from vcfc_tpu.ops.huffman import CTX_INIT

        rng = np.random.default_rng(7)
        alphabet = 300
        n_blocks, B = 5, 4096
        # sparse positional cells: ~1/6 density like real symbol grids
        grid = np.where(
            rng.random((n_blocks, B)) < 0.18,
            rng.integers(1, alphabet, size=(n_blocks, B)),
            0,
        ).astype(np.int32)
        streams = [grid[b][grid[b] != 0].astype(np.int64) for b in range(n_blocks)]
        classes = symbol_classes(alphabet)
        if n_ctx == 1:
            freqs = np.bincount(np.concatenate(streams), minlength=alphabet)
            books = [Codebook.from_frequencies(freqs)]
        else:
            books = context_codebooks(streams, alphabet, classes, n_ctx)
        wv, emit, tb, bad = pack_cells(
            jnp.asarray(grid), jnp.asarray(grid != 0),
            jnp.asarray(pack_entries(books)), 10**9, CTX_INIT,
            n_ctx=n_ctx, v4=False,
        )
        assert not bool(np.asarray(bad).any())
        payloads = compact_payloads(wv, emit, tb)
        for b in range(n_blocks):
            if n_ctx == 1:
                want, bits = pack_symbols(streams[b], books[0])
            else:
                want, bits = pack_symbols_ctx(streams[b], books, classes)
            assert payloads[b] == want
            assert int(np.asarray(tb)[b]) == bits

    def test_pack_cells_final_cell_straddle(self):
        """A final valid cell whose code straddles a 32-bit word boundary
        must not drop its spill (the kernel pads one trailing cell)."""
        import jax.numpy as jnp

        from vcfc_tpu.ops.huffman import Codebook, pack_symbols
        from vcfc_tpu.ops.vcfz_device import (
            compact_payloads,
            pack_cells,
            pack_entries,
        )

        # 5 symbols x 7 bits = 35 bits: the 3rd-through-5th cells cross
        # the word boundary; the LAST cell is valid (no trailing padding
        # from the caller)
        lengths = np.zeros(300, np.uint8)
        lengths[1:129] = 7
        book = Codebook.from_lengths(lengths)
        syms = np.array([[1, 2, 3, 4, 5]], np.int32)
        wv, emit, tb, bad = pack_cells(
            jnp.asarray(syms), jnp.ones((1, 5), bool),
            jnp.asarray(pack_entries([book])), 10**9, 0, n_ctx=1, v4=False,
        )
        assert not bool(np.asarray(bad).any())
        want, bits = pack_symbols(syms[0].astype(np.int64), book)
        assert int(np.asarray(tb)[0]) == bits == 35
        assert compact_payloads(wv, emit, tb)[0] == want


class TestPackCellsCompact:
    """pack_cells_compact: the compact-space packer must emit bit-for-bit
    the dense packer's word stream from front-compacted symbols (the
    route pairs it with sort_compact under device compaction — the dense
    codeword lookup was 91% of the on-chip packer wall)."""

    @pytest.mark.parametrize("n_ctx", [1, 4])
    def test_matches_dense_packer(self, n_ctx):
        import jax.numpy as jnp

        from vcfc_tpu.ops.huffman import (
            CTX_INIT,
            Codebook,
            context_codebooks,
            symbol_classes,
        )
        from vcfc_tpu.ops.vcfz_device import (
            compact_payloads,
            pack_cells,
            pack_cells_compact,
            pack_entries,
            sort_compact,
        )

        rng = np.random.default_rng(11)
        alphabet = 300
        n_blocks, B = 5, 4096
        grid = np.where(
            rng.random((n_blocks, B)) < 0.18,
            rng.integers(1, alphabet, size=(n_blocks, B)),
            0,
        ).astype(np.int32)
        # one empty row: counts=0 must yield an empty payload
        grid[3] = 0
        streams = [g[g != 0].astype(np.int64) for g in grid]
        classes = symbol_classes(alphabet)
        if n_ctx == 1:
            freqs = np.bincount(
                np.concatenate(streams), minlength=alphabet
            )
            books = [Codebook.from_frequencies(freqs)]
        else:
            books = context_codebooks(streams, alphabet, classes, n_ctx)
        entries = jnp.asarray(pack_entries(books))

        wv_d, emit_d, tb_d, bad_d = pack_cells(
            jnp.asarray(grid), jnp.asarray(grid != 0), entries,
            10**9, CTX_INIT, n_ctx=n_ctx, v4=False,
        )
        assert not bool(np.asarray(bad_d).any())
        want = compact_payloads(wv_d, emit_d, tb_d)

        sc, cnt = sort_compact(jnp.asarray(grid), jnp.asarray(grid != 0))
        kb = int(np.asarray(cnt).max()) + 3  # deliberately untidy width
        wv, emit, tb, bad = pack_cells_compact(
            sc[:, :kb], cnt, entries, 10**9, CTX_INIT,
            n_ctx=n_ctx, v4=False,
        )
        assert not bool(np.asarray(bad).any())
        np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb_d))
        assert compact_payloads(wv, emit, tb) == want
