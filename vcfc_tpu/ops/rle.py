"""Device RLE codec: vectorized run-length encode/decode of genotype codes.

TPU-first design: where the reference walks samples byte-at-a-time in a
scalar loop (compress.cpp:124-186, 832-954), we operate on a dense
(lines x samples) uint8 code matrix with data-parallel VPU primitives:

  encode:  run boundaries  = shifted-compare + per-code run-cap splitting
           run starts      = cummax segmented scan
           run lengths     = reverse cummin of boundary positions
           flag bytes      = mask LUT | run length
           compaction      = cumsum prefix positions + scatter

  decode:  run lengths     = flag-byte bit masks
           sample offsets  = exclusive cumsum
           segment expand  = scatter-ones + cumsum + gather
           ASCII render    = 4-byte LUT per code ("0|0\t", ...)

Everything is jit-compiled with static shapes; lines are batched into
fixed-size buckets by the host layer so XLA compiles once per bucket.

Genotype codes: 0="0|0", 1="0|1", 2="1|0", 3="1|1", 4=escape (any other
ASCII genotype; carried in a host-side side channel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import (
    CODE_ESCAPE,
    MAX_RUN_00,
    MAX_RUN_HET,
    SAMPLE_MASKED_01,
    SAMPLE_MASKED_10,
    SAMPLE_MASKED_11,
    SAMPLE_MASKED_UNCOMPRESSED,
)

# Per-code run-length caps (compress.cpp:126-127; escapes are emitted one at
# a time with count 1, compress.cpp:171-185).
_CAPS = np.array([MAX_RUN_00, MAX_RUN_HET, MAX_RUN_HET, MAX_RUN_HET, 1], np.int32)
# Flag byte base value per code (utils.hpp:44-56).
_FLAG_BASE = np.array(
    [0x00, SAMPLE_MASKED_01, SAMPLE_MASKED_10, SAMPLE_MASKED_11, SAMPLE_MASKED_UNCOMPRESSED],
    np.int32,
)
# ASCII render LUT: code -> b"X|Y\t" (escape renders a placeholder patched by
# the host assembler).
_TEXT = np.zeros((5, 4), np.uint8)
for _c, _s in enumerate([b"0|0\t", b"0|1\t", b"1|0\t", b"1|1\t", b"?|?\t"]):
    _TEXT[_c] = np.frombuffer(_s, np.uint8)


@jax.jit
def rle_encode(codes: jax.Array, n_samples: jax.Array):
    """Encode a (L, S_pad) uint8 code matrix into packed .vcfc flag bytes.

    Columns >= ``n_samples`` are padding and produce no output.
    ``n_samples`` is a traced scalar so one compilation serves every sample
    count within a padded width.

    Returns:
      flags:     (L, S_pad) uint8 — flag bytes left-packed per row
      seg_start: (L, S_pad) int32 — sample index of each packed segment's
                 first sample (for escape side-channel lookup); -1 padding
      nseg:      (L,) int32 — number of valid flag bytes per row
    """
    L, S_pad = codes.shape
    c = codes.astype(jnp.int32)
    idx = jnp.broadcast_to(jnp.arange(S_pad, dtype=jnp.int32)[None, :], (L, S_pad))

    prev = jnp.pad(c[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    new_run = (c != prev) | (c == CODE_ESCAPE) | (prev == CODE_ESCAPE)

    run_start = jax.lax.cummax(jnp.where(new_run, idx, -1), axis=1)
    cap = jnp.asarray(_CAPS)[jnp.clip(c, 0, 4)]
    boundary = ((idx - run_start) % cap == 0) & (idx < n_samples)

    # next boundary position to the right (inclusive scan on reversed axis),
    # sentinel n_samples closes the final run
    bpos = jnp.where(boundary, idx, n_samples)
    nb_incl = jax.lax.cummin(bpos[:, ::-1], axis=1)[:, ::-1]
    nb_excl = jnp.pad(nb_incl[:, 1:], ((0, 0), (0, 1)), constant_values=n_samples)

    seg_len = jnp.where(boundary, jnp.minimum(nb_excl, n_samples) - idx, 0)
    flag = jnp.asarray(_FLAG_BASE)[jnp.clip(c, 0, 4)] | seg_len

    # left-pack the boundary flags: dest position = prefix count of boundaries
    pos = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(boundary, pos, S_pad)  # out-of-range -> dropped
    rows = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, S_pad))
    flags = (
        jnp.zeros((L, S_pad), jnp.uint8)
        .at[rows, dest]
        .set(flag.astype(jnp.uint8), mode="drop")
    )
    seg_start = (
        jnp.full((L, S_pad), -1, jnp.int32).at[rows, dest].set(idx, mode="drop")
    )
    nseg = boundary.sum(axis=1, dtype=jnp.int32)
    return flags, seg_start, nseg


@functools.partial(jax.jit, static_argnames=("out_width",))
def rle_decode(flags: jax.Array, nflags: jax.Array, n_samples: jax.Array, *, out_width: int):
    """Decode packed flag bytes back to codes and rendered ASCII.

    Args:
      flags:     (L, M) uint8 — flag bytes, left-packed per row
      nflags:    (L,) int32 — valid flag count per row
      n_samples: traced scalar — true sample count (columns beyond it pad)
      out_width: static padded sample width (>= n_samples)

    Returns:
      codes:   (L, out_width) uint8 (columns >= n_samples are padding)
      text:    (L, out_width * 4) uint8 — "X|Y\t" per sample (escape samples
               render "?|?\t" and are patched by the host assembler; the
               final tab is dropped host-side)
      decoded: (L,) int32 — number of samples produced (== n_samples iff the
               stream is well-formed)
    """
    L, M = flags.shape
    f = flags.astype(jnp.int32)
    is00 = (f & 0x80) == 0
    isesc = (f & 0xE0) == 0xE0
    masked = f & 0xE0
    code = jnp.where(
        is00,
        0,
        jnp.where(
            isesc,
            CODE_ESCAPE,
            jnp.where(masked == SAMPLE_MASKED_01, 1, jnp.where(masked == SAMPLE_MASKED_10, 2, 3)),
        ),
    )
    run_len = jnp.where(is00, f & 0x7F, jnp.where(isesc, 1, f & 0x1F))
    valid = jnp.arange(M, dtype=jnp.int32)[None, :] < nflags[:, None]
    run_len = jnp.where(valid, run_len, 0)

    starts = jnp.cumsum(run_len, axis=1) - run_len  # exclusive prefix sum
    decoded = jnp.sum(run_len, axis=1)

    rows = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, M))
    dest = jnp.where(valid & (run_len > 0), starts, out_width)
    seg_marks = (
        jnp.zeros((L, out_width), jnp.int32).at[rows, dest].add(1, mode="drop")
    )
    seg_id = jnp.cumsum(seg_marks, axis=1) - 1
    codes = jnp.take_along_axis(code, jnp.clip(seg_id, 0, M - 1), axis=1).astype(jnp.uint8)
    text = jnp.asarray(_TEXT)[codes].reshape(L, out_width * 4)
    return codes, text, decoded
