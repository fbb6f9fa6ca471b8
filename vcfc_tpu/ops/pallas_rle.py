"""Fused Pallas TPU kernels for the RLE codec.

The XLA path in ops/rle.py lowers to a chain of cummax/cummin/elementwise
ops, each a separate HBM round-trip.  These kernels fuse the whole
encode (or decode) into one pass: a (block_l, S_pad) tile is read into
VMEM once, all scans run as log-step shift-and-select doubling on the
VPU (pltpu.roll along the lane axis), and the result is written once.

Width scaling: the tile height adapts to the sample width (a fixed
~3 MB i32 working-array budget per tile — 256 rows at S_pad<=4096,
down to 8 rows at S_pad=65536), and the run-cap remainders switch from
magic-number multiply-shift (exact only to d<16,644) to Mersenne-prime
digit-sum folds (127 = 2^7-1, 31 = 2^5-1: summing base-2^k digits is
exact mod 2^k-1 for any d < 2^21), so the fused kernels cover cohorts
to S_pad = 65,536 (the text kernels to 49,152: their i32 text tile is
2x wider, see max_fused_width) — wider cohorts fall back to XLA.

The *_text_* kernels additionally fuse the host classify/render steps:
encode consumes raw genotype-region ASCII (one int32 word per 4-byte
"a|b\t" sample field) and decode emits it, so the whole text->flags->
text loop runs on device (the reference's per-sample scan these replace:
compress.cpp:124-186 encode, 832-954 + cache render decode).

Semantics are identical to ops.rle (tested against it); the engine picks
the Pallas path on TPU via VCFC_KERNEL=pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.constants import CODE_ESCAPE

# Working-array VMEM budget per tile.  Measured on v5e: the compiler's
# scoped-VMEM stack holds ~4.3 concurrent working arrays (64 rows x
# 16384 lanes x 4 B = 4 MB/array OOMed at 17.43M vs the 16M limit), so
# 3 MB per array keeps the estimated peak under ~13 MB with headroom.
# The 256-row x 2560-lane headline shape is unchanged.
_TILE_BUDGET = 3 << 20
# Widest sample axis the fused kernels accept: at the 8-row floor the
# working arrays hit the budget; engine._kernels routes wider cohorts
# (beyond any real cohort) to the XLA kernels.  The Mersenne remainders
# are exact to d < 2^21, far beyond this bound.
MAX_WIDTH = 1 << 16


def max_fused_width(shrink: int = 1) -> int:
    """Widest S_pad the fused kernels accept for a kernel family whose
    working arrays are ``shrink``x the budget: the 8-row tile floor must
    still fit the VMEM budget (ADVICE r3: at shrink=2 the old MAX_WIDTH
    let cap drop below 8 rows and overran the scoped-VMEM budget)."""
    return min(MAX_WIDTH, _TILE_BUDGET // shrink // (4 * 8))


def _block_l(s_pad: int, shrink: int = 1) -> int:
    """Tile height (power of two, 8..256) fitting the VMEM budget; the
    text kernels pass shrink=2 (their i32 text tile is 4x the u8 one)."""
    cap = _TILE_BUDGET // shrink // (4 * s_pad)
    if cap < 8:
        raise ValueError(
            f"S_pad {s_pad} exceeds the fused-kernel VMEM budget at the "
            f"8-row tile floor (max {max_fused_width(shrink)}) — route to "
            "the XLA kernels (engine._kernels does)"
        )
    bl = 8
    while bl * 2 <= min(cap, 256):
        bl *= 2
    return bl


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _shift_right(x, k, fill):
    """x[i] -> x[i-k] along lanes; positions < k get `fill`."""
    S = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    rolled = pltpu.roll(x, k, axis=len(x.shape) - 1)
    return jnp.where(idx >= k, rolled, fill)


def _shift_left(x, k, fill):
    """x[i] -> x[i+k] along lanes; positions >= S-k get `fill`.
    (pltpu.roll requires non-negative shifts: roll by S-k.)"""
    S = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    rolled = pltpu.roll(x, S - k, axis=len(x.shape) - 1)
    return jnp.where(idx < S - k, rolled, fill)


def _rem_mod_caps(d, c, s_pad: int):
    """rem = d mod cap with cap = 127 where c == 0 else 31 (escape runs
    have cap 1 but always start a new run, so d == 0 and rem31 == 0
    there).  A data-dependent divisor lowers to a full vector integer
    division (~1 ms/21M cells measured); two constant-divisor forms are
    ~10-20 VPU ops.

    Narrow tiles use magic-number multiply-shift: with m = ceil(2**21 /
    cap) and e = m*cap - 2**21, floor(d*m >> 21) == d//cap for
    d < 2**21/e — 16,644 for cap 127 (e=126), 72,315 for cap 31 (e=29).

    Wide tiles switch to Mersenne digit-sum folds (exact for ANY
    d < 2**21): both caps are 2**k - 1, and summing base-2**k digits
    preserves the value mod 2**k - 1."""
    if s_pad <= 4096:
        q127 = (d * 16514) >> 21  # ceil(2**21/127); exact for d < 16,644
        q31 = (d * 67651) >> 21  # ceil(2**21/31); exact for d < 72,315
        return jnp.where(c == 0, d - q127 * 127, d - q31 * 31)
    x = (d >> 14) + ((d >> 7) & 127) + (d & 127)  # <= 381 for d < 2**21
    x = (x >> 7) + (x & 127)  # <= 129
    r127 = jnp.where(x >= 127, x - 127, x)
    y = (d >> 15) + ((d >> 10) & 31) + ((d >> 5) & 31) + (d & 31)  # <= 124
    y = (y >> 5) + (y & 31)  # <= 34
    r31 = jnp.where(y >= 31, y - 31, y)
    return jnp.where(c == 0, r127, r31)


def _encode_body(c, n):
    """Shared encode computation: (BL, S_pad) int32 codes -> positional
    flag bytes + per-row segment count."""
    BL, S_pad = c.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)

    prev = _shift_right(c, 1, -1)
    new_run = (c != prev) | (c == CODE_ESCAPE) | (prev == CODE_ESCAPE)

    # run_start[i] = max_{j<=i} (new_run[j] ? j : -1) by shift-and-max
    # doubling.  The first 7 steps (shifts < 128) run MASK-FREE on a
    # 128-column left-padded copy: a circular roll only wraps row-end
    # values into the pad region, so the per-step iota-compare+select of
    # the edge fill disappears (2 vector ops/step instead of 4 —
    # measured ~15% whole-kernel win; a hierarchical carry on 128x
    # smaller arrays was tried instead and LOST ~30%: Mosaic relayouts
    # of the tiny cross-window arrays cost more than the 5 full-width
    # steps they save).  Steps >= 128 wrap past the pad and keep the
    # masked form.  (int16 scans would halve VPU traffic, but Mosaic has
    # no non-32-bit rotate: "tpu.dynamic_rotate ... i16".)
    lane = len(c.shape) - 1
    mp = jnp.concatenate(
        [jnp.full((BL, 128), -1, jnp.int32), jnp.where(new_run, idx, -1)], axis=1
    )
    k = 1
    while k < min(128, S_pad):
        mp = jnp.maximum(mp, pltpu.roll(mp, k, axis=lane))
        k *= 2
    m = mp[:, 128:]
    while k < S_pad:
        m = jnp.maximum(m, _shift_right(m, k, -1))
        k *= 2
    run_start = m

    d = idx - run_start
    rem = _rem_mod_caps(d, c, S_pad)
    boundary = (rem == 0) & (idx < n)

    # Segment-end flag placement: the last position of a segment is the
    # one right before the next boundary (or position n-1), and there
    # the segment length is just rem + 1 — the whole next-boundary
    # suffix scan of the start-placement formulation disappears.
    next_boundary = _shift_left(boundary.astype(jnp.int32), 1, 0)
    last = (next_boundary > 0) | (idx == n - 1)
    base = jnp.where(
        c == 0,
        0,
        jnp.where(c == 1, 0xA0, jnp.where(c == 2, 0xC0, jnp.where(c == 3, 0x80, 0xE0))),
    )
    flags = jnp.where(last, base | (rem + 1), 0).astype(jnp.uint8)
    nseg = boundary.sum(axis=1, dtype=jnp.int32, keepdims=True)
    return flags, nseg


def _encode_kernel(n_ref, codes_ref, flag_ref, nseg_ref):
    flags, nseg = _encode_body(codes_ref[:].astype(jnp.int32), n_ref[0])
    flag_ref[:] = flags
    nseg_ref[:] = nseg


def _decode_body(f, n):
    """Shared decode computation: (BL, S_pad) int32 flag bytes ->
    (codes, run_len-per-flag, per-row decoded-sample count)."""
    BL, S_pad = f.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)

    present = f > 0
    # next-set fill via ONE packed reverse cummin: (position << 8) | flag
    # — the earliest set position at-or-after wins by construction.
    # Flags sit at segment ENDS and run lengths cap at 127, so every
    # valid position has its flag at most 126 ahead: a 128-wide windowed
    # scan (7 steps) replaces the full-width one (12+ steps).  Padding
    # columns past the final flag fill to the sentinel (v=0xFF); they
    # are outside the valid mask everywhere downstream.
    big = jnp.int32(0x7FFFFFFF)
    # mask-free reverse min-scan on a 128-column RIGHT-padded copy (the
    # mirror of the encode scan's left pad): rolls wrap row-start values
    # into the pad only, so the per-step edge select disappears
    mp = jnp.concatenate(
        [jnp.where(present, (idx << 8) | f, big), jnp.full((BL, 128), big, jnp.int32)],
        axis=1,
    )
    lane = len(f.shape) - 1
    k = 1
    while k < min(128, S_pad):
        mp = jnp.minimum(mp, pltpu.roll(mp, S_pad + 128 - k, axis=lane))
        k *= 2
    v = mp[:, :S_pad] & 0xFF

    is00 = (v & 0x80) == 0
    isesc = (v & 0xE0) == 0xE0
    masked = v & 0xE0
    code = jnp.where(
        is00,
        0,
        jnp.where(isesc, CODE_ESCAPE, jnp.where(masked == 0xA0, 1, jnp.where(masked == 0xC0, 2, 3))),
    )

    run_len = jnp.where(
        present,
        jnp.where((f & 0x80) == 0, f & 0x7F, jnp.where((f & 0xE0) == 0xE0, 1, f & 0x1F)),
        0,
    )
    decoded = jnp.sum(run_len * (idx < n), axis=1, dtype=jnp.int32, keepdims=True)
    return code, decoded


def _decode_kernel(n_ref, flag_ref, codes_ref, decoded_ref):
    code, decoded = _decode_body(flag_ref[:].astype(jnp.int32), n_ref[0])
    codes_ref[:] = code.astype(jnp.uint8)
    decoded_ref[:] = decoded


# ---------------------------------------------------------------------------
# Text-fused kernels: the 4-byte "a|b\t" sample word is exactly one i32
# lane (little-endian: b0 | b1<<8 | b2<<16 | sep<<24), so ASCII
# classification and rendering are a handful of shift/mask/select VPU
# ops — no strided byte access, no gather.  Replaces the host classify
# (vcfc_host.cpp::vcfc_classify) / render (::vcfc_render) passes with
# device work; the host keeps only line indexing and escape splicing.


def _classify_words(t):
    """(BL, S_pad) int32 text words -> (codes int32, sep byte int32).
    Any field not matching [01]|[01] classifies as escape (code 4) —
    same predicate as the reference's four-GT match (compress.cpp:
    126-170; everything else takes the escape path :171-185)."""
    b0 = t & 0xFF
    b1 = (t >> 8) & 0xFF
    b2 = (t >> 16) & 0xFF
    sep = (t >> 24) & 0xFF  # arithmetic shift + mask still isolates the byte
    gt0 = (b0 - 48) & ~1  # 0 iff b0 in {'0','1'}
    gt2 = (b2 - 48) & ~1
    valid = (gt0 == 0) & (b1 == 124) & (gt2 == 0)
    codes = jnp.where(valid, (b0 - 48) * 2 + (b2 - 48), CODE_ESCAPE)
    return codes, sep


def _text_encode_kernel(n_ref, text_ref, flag_ref, nseg_ref, reg_ref):
    n = n_ref[0]
    t = text_ref[:]
    BL, S_pad = t.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)
    codes, sep = _classify_words(t)
    flags, nseg = _encode_body(codes, n)
    flag_ref[:] = flags
    nseg_ref[:] = nseg
    # layout check: every separator byte before the last sample must be a
    # tab (the host only length-checks; a line like "0|0x0|0..." with
    # compensating widths would mis-slice) — one AND-reduce per row
    seps_ok = jnp.where(idx < n - 1, (sep == 9).astype(jnp.int32), 1)
    reg_ref[:] = jnp.min(seps_ok, axis=1, keepdims=True)


def _render_words(code, n, idx):
    """codes -> "a|b\t" i32 text words; escapes render the "?|?"
    placeholder (the host splices the real ASCII from the side channel);
    the final sample's separator renders as newline."""
    esc = code == CODE_ESCAPE
    b0 = jnp.where(esc, 63, 48 + (code >> 1))
    b2 = jnp.where(esc, 63, 48 + (code & 1))
    sep = jnp.where(idx == n - 1, 10, 9)
    return b0 | (124 << 8) | (b2 << 16) | (sep << 24)


def _text_decode_kernel(n_ref, flag_ref, text_ref, codes_ref, decoded_ref):
    n = n_ref[0]
    f = flag_ref[:].astype(jnp.int32)
    BL, S_pad = f.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)
    code, decoded = _decode_body(f, n)
    codes_ref[:] = code.astype(jnp.uint8)
    decoded_ref[:] = decoded
    text_ref[:] = _render_words(code, n, idx)


# ---------------------------------------------------------------------------


def _grid_call(kernel, x, n_samples, out_shapes, interpret, shrink=1):
    """out_shapes: list of (lanes, dtype) — lanes is S_pad or 1."""
    L, S_pad = x.shape
    if S_pad > max_fused_width(shrink):
        raise ValueError(
            f"sample width {S_pad} > {max_fused_width(shrink)}: beyond the "
            "fused kernels' VMEM budget — use the XLA kernels "
            "(engine._kernels does)"
        )
    block_l = _block_l(S_pad, shrink)
    if L % block_l:
        raise ValueError(f"line count {L} not a multiple of block_l={block_l}")
    grid = (L // block_l,)
    n_arr = jnp.full((1,), n_samples, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_l, S_pad), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_l, lanes), lambda i, n: (i, 0), memory_space=pltpu.VMEM)
                for lanes, _ in out_shapes
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((L, lanes), dtype) for lanes, dtype in out_shapes
        ],
        interpret=interpret,
    )(n_arr, x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rle_encode(codes: jax.Array, n_samples, interpret: bool = False):
    """Fused-TPU equivalent of ops.rle.rle_encode.

    codes: (L, S_pad) uint8 with L a multiple of the adaptive tile height
    (256 suffices for every width).
    Returns (flagpos (L, S_pad) uint8, nseg (L,) int32).
    """
    S_pad = codes.shape[1]
    flag, nseg = _grid_call(
        _encode_kernel, codes, n_samples,
        [(S_pad, jnp.uint8), (1, jnp.int32)], interpret,
    )
    return flag, nseg.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rle_decode(flagpos: jax.Array, n_samples, interpret: bool = False):
    """Fused-TPU equivalent of ops.rle.rle_decode."""
    S_pad = flagpos.shape[1]
    codes, decoded = _grid_call(
        _decode_kernel, flagpos, n_samples,
        [(S_pad, jnp.uint8), (1, jnp.int32)], interpret,
    )
    return codes, decoded.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_text_encode(text: jax.Array, n_samples, interpret: bool = False):
    """Fused classify+encode from genotype-region ASCII.

    text: (L, S_pad) int32 — one little-endian "a|b\\t" word per sample
    field (host builds it as a zero-copy u8->i32 view of the gathered
    text; see engine._compress_device_text).
    Returns (flagpos uint8, nseg int32, seps_ok int32 — 0 marks rows
    whose separator bytes are not tabs, i.e. mis-sliced irregular lines).
    """
    S_pad = text.shape[1]
    flag, nseg, reg = _grid_call(
        _text_encode_kernel, text, n_samples,
        [(S_pad, jnp.uint8), (1, jnp.int32), (1, jnp.int32)], interpret, shrink=2,
    )
    return flag, nseg.reshape(-1), reg.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_text_decode(flagpos: jax.Array, n_samples, interpret: bool = False):
    """Fused decode+render to genotype-region ASCII.

    Returns (text (L, S_pad) int32 "a|b\\t" words with "?|?" escape
    placeholders and '\\n' terminating sample n-1, codes uint8,
    decoded int32)."""
    S_pad = flagpos.shape[1]
    text, codes, decoded = _grid_call(
        _text_decode_kernel, flagpos, n_samples,
        [(S_pad, jnp.int32), (S_pad, jnp.uint8), (1, jnp.int32)], interpret, shrink=2,
    )
    return text, codes, decoded.reshape(-1)
