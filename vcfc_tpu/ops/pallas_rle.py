"""Fused Pallas TPU kernels for the RLE codec.

The XLA path in ops/rle.py lowers to a chain of cummax/cummin/elementwise
ops, each a separate HBM round-trip.  These kernels fuse the whole
encode (or decode) into one pass: a (BLOCK_L, S_pad) tile is read into
VMEM once, all scans run as log-step shift-and-select doubling on the
VPU (pltpu.roll along the lane axis), and the result is written once.

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

# 256 rows per tile: ~14% faster decode than 128 (fewer grid steps);
# 512 exceeds the 16 MB scoped-VMEM stack at S_pad=2560 (compiler OOM).
BLOCK_L = 256
# Widest sample axis the fused kernels accept: one VMEM tile per block,
# and the encode magic-number remainders are value-exact to 16,644 —
# far above this bound.  engine._kernels routes wider cohorts to XLA.
MAX_WIDTH = 4096


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


def _encode_kernel(n_ref, codes_ref, flag_ref, nseg_ref):
    c = codes_ref[:].astype(jnp.int32)
    BL, S_pad = c.shape
    n = n_ref[0]
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

    # rem = (idx - run_start) % cap with cap in {127, 31, 1}.  A
    # data-dependent divisor lowers to a full vector integer division
    # (~1 ms/21M cells measured); constant divisors via magic-number
    # multiply-shift are ~10 VPU ops.  The rem VALUE goes into the flag
    # byte (not just a rem==0 test), so the quotients must be exact over
    # the whole d range: with m = ceil(2**21/cap) and e = m*cap - 2**21,
    # floor(d*m >> 21) == d//cap for d < 2**21/e — 16,644 for cap 127
    # (e=126) and 72,315 for cap 31 (e=29), both beyond the kernel's
    # S_pad <= MAX_WIDTH bound (enforced in _grid_call; engine routes
    # wider cohorts to the XLA kernels, which use exact %).  Escape
    # positions (cap=1) always have d == 0 (they force new_run on both
    # sides), so the cap-31 remainder is 0 there.
    d = idx - run_start
    q127 = (d * 16514) >> 21  # ceil(2**21/127); exact for d < 16,644
    q31 = (d * 67651) >> 21  # ceil(2**21/31); exact for d < 72,315
    rem = jnp.where(c == 0, d - q127 * 127, d - q31 * 31)
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
    flag_ref[:] = jnp.where(last, base | (rem + 1), 0).astype(jnp.uint8)
    nseg_ref[:] = boundary.sum(axis=1, dtype=jnp.int32, keepdims=True)


def _decode_kernel(n_ref, flag_ref, codes_ref, decoded_ref):
    f = flag_ref[:].astype(jnp.int32)
    BL, S_pad = f.shape
    n = n_ref[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)

    present = f > 0
    # next-set fill via ONE packed reverse cummin: (position << 8) | flag
    # — the earliest set position at-or-after wins by construction.
    # Flags sit at segment ENDS and run lengths cap at 127, so every
    # valid position has its flag at most 126 ahead: a 128-wide windowed
    # scan (7 steps) replaces the full-width one (12 steps).  Padding
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
    codes_ref[:] = code.astype(jnp.uint8)

    run_len = jnp.where(
        present,
        jnp.where((f & 0x80) == 0, f & 0x7F, jnp.where((f & 0xE0) == 0xE0, 1, f & 0x1F)),
        0,
    )
    decoded_ref[:] = jnp.sum(
        run_len * (idx < n), axis=1, dtype=jnp.int32, keepdims=True
    )


def _grid_call(kernel, x, n_samples, out_dtypes, interpret):
    L, S_pad = x.shape
    if S_pad > MAX_WIDTH:
        raise ValueError(
            f"sample width {S_pad} > {MAX_WIDTH}: beyond the magic-number "
            "remainder range — use the XLA kernels (engine._kernels does)"
        )
    if L % BLOCK_L:
        raise ValueError(f"line count {L} not a multiple of BLOCK_L={BLOCK_L}")
    grid = (L // BLOCK_L,)
    n_arr = jnp.full((1,), n_samples, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_L, S_pad), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_L, S_pad), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_L, 1), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((L, S_pad), out_dtypes[0]),
            jax.ShapeDtypeStruct((L, 1), out_dtypes[1]),
        ],
        interpret=interpret,
    )(n_arr, x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rle_encode(codes: jax.Array, n_samples, interpret: bool = False):
    """Fused-TPU equivalent of ops.rle.rle_encode.

    codes: (L, S_pad) uint8 with L a multiple of BLOCK_L.
    Returns (flagpos (L, S_pad) uint8, nseg (L,) int32).
    """
    flag, nseg = _grid_call(
        _encode_kernel, codes, n_samples, (jnp.uint8, jnp.int32), interpret
    )
    return flag, nseg.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rle_decode(flagpos: jax.Array, n_samples, interpret: bool = False):
    """Fused-TPU equivalent of ops.rle.rle_decode."""
    codes, decoded = _grid_call(
        _decode_kernel, flagpos, n_samples, (jnp.uint8, jnp.int32), interpret
    )
    return codes, decoded.reshape(-1)
