"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax

from vcfc_tpu.ops.histogram import code_histogram, masked_code_histogram
from vcfc_tpu.ops.rle import rle_encode
from vcfc_tpu.parallel.mesh import make_data_mesh
from vcfc_tpu.parallel.shard import make_sharded_encode_step


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_histogram():
    codes = np.zeros((4, 128), np.uint8)
    codes[0, :5] = [1, 2, 3, 4, 1]
    h = np.asarray(code_histogram(codes))
    assert h.sum() == 4 * 128
    assert h[1] == 2 and h[2] == 1 and h[3] == 1 and h[4] == 1

    hm = np.asarray(masked_code_histogram(codes, 5))
    assert hm.sum() == 4 * 5


def test_sharded_encode_matches_single_device():
    rng = np.random.default_rng(0)
    L, S_pad, S = 64, 128, 100
    codes = rng.choice(5, size=(L, S_pad), p=[0.8, 0.07, 0.07, 0.04, 0.02]).astype(
        np.uint8
    )
    codes[:, S:] = 0

    mesh = make_data_mesh(8)
    step = make_sharded_encode_step(mesh)
    flags, nseg, hist, offsets = map(np.asarray, step(codes, S))

    # single-device reference
    f1, k1 = map(np.asarray, rle_encode(codes, S))
    np.testing.assert_array_equal(flags, f1)
    np.testing.assert_array_equal(nseg, k1)

    assert hist.sum() == L * S
    # deterministic exclusive prefix of per-shard byte counts
    per_shard = k1.reshape(8, -1).sum(axis=1)
    want = np.concatenate([[0], np.cumsum(per_shard)[:-1]])
    np.testing.assert_array_equal(offsets.reshape(-1), want)


def test_graft_entry_contract():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    mod.dryrun_multichip(8)


def test_multihost_compress_single_process(tmp_path, small_vcf=None):
    """compress_multihost degrades to plain compress at 1 process and the
    stitched output is byte-identical."""
    import pathlib

    from vcfc_tpu.format.vcf import compress_bytes
    from vcfc_tpu.parallel.distributed import compress_multihost

    data_dir = pathlib.Path(__file__).parent / "data"
    vcf = (data_dir / "small.vcf").read_bytes()
    inp = tmp_path / "in.vcf"
    outp = tmp_path / "out.vcfc"
    inp.write_bytes(vcf)
    stats = compress_multihost(str(inp), str(outp))
    assert stats["processes"] == 1
    assert outp.read_bytes() == compress_bytes(vcf)
    assert sum(stats["histogram"]) == 200 * 100


class TestCtxFlagHistogram:
    def _np_reference(self, flagpos, n_samples):
        import numpy as np
        from vcfc_tpu.ops.huffman import CTX_INIT

        hist = np.zeros((4, 256), np.int64)
        for row in np.asarray(flagpos):
            ctx = CTX_INIT
            for j, f in enumerate(row[:n_samples]):
                f = int(f)
                if f == 0:
                    continue
                hist[ctx, f] += 1
                ctx = 0 if f == 0x7F else 1 if f < 0x80 else 2 if f < 0xE0 else 3
        return hist

    def test_matches_scalar_reference(self):
        import numpy as np
        from vcfc_tpu.ops.histogram import ctx_flag_histogram
        from vcfc_tpu.ops.rle import rle_encode

        rng = np.random.default_rng(7)
        codes = rng.choice(5, size=(16, 256), p=[0.7, 0.1, 0.1, 0.05, 0.05]).astype(
            np.uint8
        )
        S = 200
        flagpos, _ = rle_encode(codes, np.int32(S))
        got = np.asarray(ctx_flag_histogram(flagpos, np.int32(S)))
        want = self._np_reference(flagpos, S)
        np.testing.assert_array_equal(got, want)

    def test_sharded_psum_equals_global(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vcfc_tpu.ops.histogram import ctx_flag_histogram
        from vcfc_tpu.ops.rle import rle_encode
        from vcfc_tpu.parallel.mesh import DATA_AXIS, make_data_mesh
        from vcfc_tpu.parallel.shard import make_sharded_codebook_step

        mesh = make_data_mesh(8)
        rng = np.random.default_rng(8)
        codes_np = rng.choice(5, size=(32, 128), p=[0.7, 0.1, 0.1, 0.05, 0.05]).astype(
            np.uint8
        )
        n = jnp.int32(100)
        codes = jax.device_put(
            jnp.asarray(codes_np), NamedSharding(mesh, P(DATA_AXIS, None))
        )
        step = make_sharded_codebook_step(mesh)
        flagpos, nseg, ctx_hist = step(codes, n)
        flag_ref, _ = rle_encode(jnp.asarray(codes_np), n)
        want = np.asarray(ctx_flag_histogram(flag_ref, n))
        np.testing.assert_array_equal(np.asarray(ctx_hist), want)
        np.testing.assert_array_equal(np.asarray(flagpos), np.asarray(flag_ref))


def test_compress_sharded_byte_identical():
    from test_fuzz import make_vcf
    from vcfc_tpu import engine
    from vcfc_tpu.format import compress_bytes

    vcf = make_vcf(901, 140, 90, sv_every=13)
    want = compress_bytes(vcf)
    got = engine.compress_sharded(vcf)  # 8-device virtual mesh
    assert got == want


def test_decompress_sharded_byte_identical():
    from test_fuzz import make_vcf
    from vcfc_tpu import engine
    from vcfc_tpu.format import compress_bytes

    vcf = make_vcf(902, 140, 90, sv_every=13)
    vcfc = compress_bytes(vcf)
    got = engine.decompress_sharded(vcfc)  # 8-device virtual mesh
    assert got == vcf


def test_sharded_vcfz_pack_matches_host_packer():
    """r4: the data-parallel .vcfz entropy-pack step under the 8-device
    mesh must produce per-block payload bytes identical to the host
    packer (blocks are independent; entries replicate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vcfc_tpu.ops.huffman import Codebook, pack_symbols
    from vcfc_tpu.ops.rle import rle_encode
    from vcfc_tpu.ops.vcfz_device import compact_payloads, pack_entries
    from vcfc_tpu.parallel.mesh import DATA_AXIS, make_data_mesh
    from vcfc_tpu.parallel.shard import make_sharded_vcfz_pack_step

    mesh = make_data_mesh(8)
    rng = np.random.default_rng(5)
    L, S, S_pad = 64, 120, 128
    block_lines = 4
    codes = np.zeros((L, S_pad), np.uint8)
    codes[:, :S] = rng.choice(5, size=(L, S), p=[0.7, 0.1, 0.1, 0.05, 0.05])
    fp = np.asarray(rle_encode(codes, S)[0])

    sym_plane = np.where((fp & 0xE0) == 0xE0, 256, fp.astype(np.int32)) * (fp > 0)
    freqs = np.bincount(sym_plane.reshape(-1), minlength=257)
    freqs[0] = 0
    book = Codebook.from_frequencies(freqs)
    step = make_sharded_vcfz_pack_step(mesh, block_lines, n_ctx=1)
    wv, emit, tb, bad = step(
        jax.device_put(jnp.asarray(fp), NamedSharding(mesh, P(DATA_AXIS, None))),
        jnp.zeros(fp.shape, jnp.int32),
        jnp.asarray(pack_entries([book])),
        0,
        0,
    )
    assert not bool(np.asarray(bad).any())
    payloads = compact_payloads(wv, emit, tb)
    for b in range(L // block_lines):
        rows = sym_plane[b * block_lines : (b + 1) * block_lines].reshape(-1)
        want, _bits = pack_symbols(rows[rows != 0].astype(np.int64), book)
        assert payloads[b] == want, f"block {b}"


def test_sharded_huffman_decode_matches_host():
    """r4: the data-parallel bit-decode step under the 8-device mesh
    must invert the host packer for every sharded stream."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vcfc_tpu.ops.huffman import Codebook, pack_symbols
    from vcfc_tpu.ops.huffman_device import device_decode_tables
    from vcfc_tpu.parallel.mesh import DATA_AXIS, make_data_mesh
    from vcfc_tpu.parallel.shard import make_sharded_huffman_decode_step

    mesh = make_data_mesh(8)
    rng = np.random.default_rng(9)
    freqs = rng.integers(1, 500, 90)
    book = Codebook.from_frequencies(freqs)
    streams = [rng.integers(0, 90, size=200 + 30 * i) for i in range(8)]
    payloads = [pack_symbols(s.astype(np.int64), book)[0] for s in streams]

    s1, s2 = 2, 2048  # 4096-bit grid covers the longest payload
    nwords = s1 * s2 // 32
    words = np.zeros((8, nwords * 4), np.uint8)
    for i, p in enumerate(payloads):
        assert len(p) * 8 <= s1 * s2
        words[i, : len(p)] = np.frombuffer(p, np.uint8)
    w32 = words.view(">u4").astype(np.uint32).view(np.int32)

    limits, idx_adjust, sorted_syms = device_decode_tables(book)
    step = make_sharded_huffman_decode_step(mesh, s1, s2)
    plane = np.asarray(
        step(
            jax.device_put(
                jnp.asarray(w32), NamedSharding(mesh, P(DATA_AXIS, None))
            ),
            limits,
            idx_adjust,
        )
    )
    for i, s in enumerate(streams):
        row = plane[i, : len(payloads[i]) * 8]
        vals = row[np.flatnonzero(row)] - 1
        np.testing.assert_array_equal(sorted_syms[vals[: len(s)]], s)


def test_sharded_resolve_matches_host():
    """The v4/v6 vertical-match resolve shards over the block axis: the
    mesh output must equal the single-device kernel's, and both must
    equal the host resolve path (pinned stream-level in
    test_huffman_device.py::TestDeviceResolve)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vcfc_tpu.format import compress_bytes
    from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc
    from vcfc_tpu.format.vcfz_device import _block_classpos
    from vcfc_tpu.ops.vcfz_device import resolve_match_grid
    from vcfc_tpu.parallel.mesh import DATA_AXIS
    from vcfc_tpu.parallel.shard import make_sharded_resolve_step
    from test_fuzz import make_vcf

    vcfc = compress_bytes(make_vcf(88, 40, 64, sv_every=11))
    z = vcfz_from_vcfc(vcfc, version=6, block_lines=8)
    r = VcfzReader.parse(z)
    S, Lb = r.n_samples, r.block_lines
    grids = []
    for b in range(len(r.blocks)):
        lo, hi = b * Lb, min((b + 1) * Lb, r.n_lines)
        syms = np.asarray(r._decode_block_symbols(b), np.int64)
        g, _ = _block_classpos(syms, r.nsym[lo:hi], S, 128, r._m_base)
        pad = np.zeros((Lb, 128), np.uint8)
        pad[: g.shape[0]] = g
        grids.append(pad)
    batch = np.stack(grids)  # 8 blocks over 8 devices

    mesh = make_data_mesh(8)
    step = make_sharded_resolve_step(mesh)
    rf, rn, rbad = step(
        jax.device_put(
            jnp.asarray(batch), NamedSharding(mesh, P(DATA_AXIS, None, None))
        ),
        jnp.int32(S),
    )
    assert not np.asarray(rbad).any()
    sf, sn, sbad = resolve_match_grid(jnp.asarray(batch), jnp.int32(S))
    np.testing.assert_array_equal(np.asarray(rf), np.asarray(sf))
    np.testing.assert_array_equal(np.asarray(rn), np.asarray(sn))
