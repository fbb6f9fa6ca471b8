"""Differential phase probe of the device `.vcfz` packer (round 5).

bench.py's `vcfz_device_GBps` (sympos_v4 + pack_cells, kernel-only) sits
~100x below a passes-over-HBM ceiling.  jax.profiler hangs over the
tunnel (docs/KERNEL_CEILING.md), so this uses the repo's differential
method: time jitted fori_loops of successively larger slices of the
pipeline on the real chip and subtract.

Variants (all at bench shapes L=8192, S=2560, block 64):
  sympos      sympos_v4 alone
  upto_take   sympos + ctx cummax + the entries-table take()
  upto_scan   ... + cumsum offsets + contrib arithmetic (no seg scan)
  full        the whole pack_cells
  take_mat    full, with take() swapped for a one-hot MXU lookup
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/vcfc_tpu/jax")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import jax
import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform == "tpu", jax.devices()

from vcfc_tpu.ops.huffman import CTX_INIT, N_CTX_V4, context_codebooks, symbol_classes
from vcfc_tpu.ops.rle import rle_encode
from vcfc_tpu.ops.vcfz_device import (
    _cell_class,
    _segmented_sum_scan,
    compact_symbols,
    pack_cells,
    pack_entries,
    sympos_v4,
)

L, S, K = 8192, 2560, 21
block_lines = 64
n_blocks = L // block_lines
m_base = 257
n_symbols = m_base + S + 1
classes = symbol_classes(n_symbols, match_base=m_base)

rng = np.random.default_rng(0)
base = rng.integers(0, 4, (1, S), dtype=np.uint8)
flip = rng.random((L, S)) < 0.03
codes_np = np.where(flip, rng.integers(0, 4, (L, S)), base).astype(np.uint8)

flags = rle_encode(jax.device_put(codes_np), jnp.int32(S))[0]
esc0 = jnp.zeros((L, S), jnp.int32)
bf_np = np.zeros(L, bool)
bf_np[::block_lines] = True
bf = jnp.asarray(bf_np)

sp0, ns0, _ = sympos_v4(flags, esc0, jnp.int32(S), bf, m_base, L)
syms, _ = compact_symbols(np.asarray(sp0))
blk_ends = np.cumsum(np.asarray(ns0).reshape(n_blocks, block_lines).sum(axis=1))
books = context_codebooks(
    np.split(syms, blk_ends[:-1]), n_symbols, classes, N_CTX_V4
)
entries = jnp.asarray(pack_entries(books))
A = entries.shape[0] // N_CTX_V4

# pin sync mode once (CLAUDE.md tunnel trap)
np.asarray(jnp.zeros((), jnp.int32) + 1)


def timed(name, step):
    def loop(x0, k):
        def body(i, carry):
            x, acc = carry
            x2, a = step(x, i)
            return x2, acc + a
        _, acc = jax.lax.fori_loop(0, k, body, (x0, jnp.int32(0)))
        return acc

    fK = jax.jit(lambda x: loop(x, K))
    f1 = jax.jit(lambda x: loop(x, 1))
    np.asarray(fK(flags))
    np.asarray(f1(flags))
    bK = b1 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fK(flags)); bK = min(bK, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f1(flags)); b1 = min(b1, time.perf_counter() - t0)
    dt = (bK - b1) / (K - 1)
    gbps = L * S * 4 / dt / 1e9
    print(f"{name:12s} {dt*1e3:8.3f} ms/iter  {gbps:8.2f} GB/s-text", flush=True)
    return dt


def opaque(v):
    # runtime-opaque always-zero uint8 (bench.py::_opaque_mask): XLA
    # cannot fold a data comparison, so the carry stays live
    return (jnp.int32(v) == jnp.int32(-0x7EAD)).astype(jnp.uint8)


def mk_cells(f_in):
    sp, ns, _d = sympos_v4(f_in, esc0, jnp.int32(S), bf, m_base, L)
    cells = sp.reshape(n_blocks, block_lines * S)
    return cells, ns


def stage_sympos(f_in, i):
    cells, ns = mk_cells(f_in)
    return (f_in ^ opaque(cells[0, 0])).astype(jnp.uint8), ns[0] + cells[0, 0]


def _prefix(cells, do_take=True, do_offsets=True):
    sym = jnp.pad(cells, ((0, 0), (0, 1)))
    valid = jnp.pad(cells != 0, ((0, 0), (0, 1)))
    nb, B = sym.shape
    cidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :], (nb, B))
    cls = _cell_class(sym, m_base, v4=True)
    packed = jnp.where(valid, (cidx << 3) | cls, -1)
    prev = jnp.pad(
        jax.lax.cummax(packed, axis=1)[:, :-1], ((0, 0), (1, 0)),
        constant_values=-1,
    )
    ctx = jnp.where(prev < 0, CTX_INIT, prev & 7)
    acc = ctx
    if do_take:
        entry = jnp.take(entries, ctx * A + jnp.where(valid, sym, 0))
        length = jnp.where(valid, entry >> 16, 0)
        code = jnp.where(valid, entry & 0xFFFF, 0)
        acc = acc + entry
        if do_offsets:
            ends = jnp.cumsum(length, axis=1)
            off = ends - length
            w_id = off >> 5
            sh = off & 31
            end = sh + length
            spill = jnp.maximum(end - 32, 0)
            n_hi = length - spill
            hi = jnp.where(valid, (code >> spill) << (32 - sh - n_hi), 0)
            lo = jnp.where(spill > 0, code << (32 - spill), 0)
            contrib = hi | jnp.pad(lo[:, :-1], ((0, 0), (1, 0)))
            acc = acc + contrib + w_id
    return acc


def stage_upto_take(f_in, i):
    cells, ns = mk_cells(f_in)
    acc = _prefix(cells, do_take=True, do_offsets=False)
    return (f_in ^ opaque(acc[0, 0])).astype(jnp.uint8), ns[0] + acc[0, 0]


def stage_upto_contrib(f_in, i):
    cells, ns = mk_cells(f_in)
    acc = _prefix(cells, do_take=True, do_offsets=True)
    return (f_in ^ opaque(acc[0, 0])).astype(jnp.uint8), ns[0] + acc[0, 0]


def stage_full(f_in, i):
    cells, ns = mk_cells(f_in)
    wv, emit, tb, bad = pack_cells(
        cells, cells != 0, entries, m_base, CTX_INIT, n_ctx=N_CTX_V4, v4=True
    )
    return (f_in ^ opaque(tb[0])).astype(jnp.uint8), tb[0] + ns[0] + wv[0, 0]


timed("sympos", stage_sympos)
timed("upto_take", stage_upto_take)
timed("upto_contrib", stage_upto_contrib)
timed("full", stage_full)
print("done", flush=True)
