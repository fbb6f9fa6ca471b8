"""SWAR falsification probe (VERDICT r3 #4): can packing 2 (or 4)
genotype cells per i32 lane beat the full-width prefix-max scan?

The shipped encode scan runs 12 log-steps of roll+max over S_pad=2560
lanes/row.  The blocked ("SWAR") formulation pre-reduces lane PAIRS
(one in-lane max), scans the pair aggregates at HALF the lanes (11
steps at S_pad/2), and resolves each half with the exclusive pair
prefix — ~2.2x less scan arithmetic on paper.  The open question is
Mosaic's price for the even/odd lane split ((BL, S_pad) ->
(BL, S_pad/2, 2) relayout): the r2 chunked-carry attempt lost 30% to
relayouts, but that paid them per scan LEVEL; this pays once per
kernel.

Variants (dispatch-subtracted in-jit timing, CLAUDE.md traps):

  encode full          the shipped kernel (baseline)
  encode swar2         shipped arithmetic + block-2 scan
  encode swar4         shipped arithmetic + block-4 scan
  scan-only full       scan isolated (r3 ceiling variant)
  scan-only swar2      block-2 scan isolated

Acceptance rule from the VERDICT: adopt if encode improves >15%,
otherwise record the measured negative in docs/KERNEL_CEILING.md.

Usage: python scripts/swar_probe.py   (TPU)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import vcfc_tpu.ops.pallas_rle as P
    from bench import _gt_codes, _make_runner, _opaque_mask, _timed

    L, S = 8192, 2560
    codes_np = _gt_codes(L, S)
    codes = jax.device_put(codes_np)
    np.asarray(jnp.zeros((), jnp.int32) + 1)  # pin synchronous dispatch

    def measure(step, x, K=51):
        mk = _make_runner(jax, jnp, step)
        return (_timed(jax, mk(K), x) - _timed(jax, mk(1), x)) / (K - 1)

    def report(name, dt):
        print(f"{name:24s} {dt*1e3:7.3f} ms  {L*S*4/dt/1e9:7.1f} GB/s-text")
        return dt

    def kernel_step(call):
        def step(c, i):
            a, b = call(c)
            c2 = (c ^ _opaque_mask(jnp, jnp.int32(a[0, 0]))).astype(jnp.uint8)
            return c2, jnp.int32(a[0, 0]) + jnp.int32(b[0, 0])

        return step

    def grid(kern):
        return lambda x: P._grid_call(
            kern, x, S, [(S, jnp.uint8), (1, jnp.int32)], False
        )

    def keys_of(c, idx):
        prev = P._shift_right(c, 1, -1)
        new_run = (c != prev) | (c == 4) | (prev == 4)
        return jnp.where(new_run, idx, -1)

    def scan_full(m, S_pad, BL):
        """The shipped scheme: 128-wide mask-free window + doubling."""
        mp = jnp.concatenate([jnp.full((BL, 128), -1, jnp.int32), m], axis=1)
        k = 1
        while k < 128:
            mp = jnp.maximum(mp, pltpu.roll(mp, k, axis=1))
            k *= 2
        m = mp[:, 128:]
        while k < S_pad:
            m = jnp.maximum(m, P._shift_right(m, k, -1))
            k *= 2
        return m

    def scan_blocked(m, S_pad, BL, block):
        """Block-`block` scan: in-lane pre-reduce, half/quarter-width
        aggregate scan, exclusive-prefix resolution per sub-cell."""
        g = m.reshape(BL, S_pad // block, block)
        parts = [g[:, :, i] for i in range(block)]
        agg = parts[0]
        for p in parts[1:]:
            agg = jnp.maximum(agg, p)
        W = S_pad // block
        win = min(128, W)
        mp = jnp.concatenate([jnp.full((BL, win), -1, jnp.int32), agg], axis=1)
        k = 1
        while k < win:
            mp = jnp.maximum(mp, pltpu.roll(mp, k, axis=1))
            k *= 2
        a = mp[:, win:]
        while k < W:
            a = jnp.maximum(a, P._shift_right(a, k, -1))
            k *= 2
        excl = P._shift_right(a, 1, -1)  # prefix over earlier groups
        outs = []
        run = excl
        for i in range(block):
            run_i = jnp.maximum(run, parts[i]) if i else jnp.maximum(excl, parts[i])
            outs.append(run_i)
            run = run_i
        return jnp.stack(outs, axis=2).reshape(BL, S_pad)

    def full_encode_with(run_start_fn):
        def kern(n_ref, codes_ref, flag_ref, nseg_ref):
            c = codes_ref[:].astype(jnp.int32)
            BL, S_pad = c.shape
            n = n_ref[0]
            idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)
            run_start = run_start_fn(keys_of(c, idx), S_pad, BL)
            d = idx - run_start
            rem = P._rem_mod_caps(d, c, S_pad)
            boundary = (rem == 0) & (idx < n)
            next_boundary = P._shift_left(boundary.astype(jnp.int32), 1, 0)
            last = (next_boundary > 0) | (idx == n - 1)
            base = jnp.where(
                c == 0, 0,
                jnp.where(
                    c == 1, 0xA0,
                    jnp.where(c == 2, 0xC0, jnp.where(c == 3, 0x80, 0xE0)),
                ),
            )
            flag_ref[:] = jnp.where(last, base | (rem + 1), 0).astype(jnp.uint8)
            nseg_ref[:] = boundary.sum(axis=1, dtype=jnp.int32, keepdims=True)

        return kern

    def scan_blocked_strided(m, S_pad, BL, block):
        """Same blocked scheme, but the half-width relayout goes through
        lane-strided slices + strided restore instead of a shape cast —
        the second Mosaic-expressibility attempt (the reshape variant
        fails infer-vector-layout on hardware, r5)."""
        parts = [m[:, i::block] for i in range(block)]
        agg = parts[0]
        for p in parts[1:]:
            agg = jnp.maximum(agg, p)
        W = S_pad // block
        win = min(128, W)
        mp = jnp.concatenate([jnp.full((BL, win), -1, jnp.int32), agg], axis=1)
        k = 1
        while k < win:
            mp = jnp.maximum(mp, pltpu.roll(mp, k, axis=1))
            k *= 2
        a = mp[:, win:]
        while k < W:
            a = jnp.maximum(a, P._shift_right(a, k, -1))
            k *= 2
        excl = P._shift_right(a, 1, -1)
        outs = []
        run = excl
        for i in range(block):
            run = jnp.maximum(run, parts[i])
            outs.append(run)
        # interleaved restore: widen each half by writing it into the
        # even/odd lanes of a zero full-width plane via strided update
        full = jnp.full((BL, S_pad), -1, jnp.int32)
        for i, o in enumerate(outs):
            full = full.at[:, i::block].set(o)
        return full

    # correctness gates first (oracle flags) — each variant individually,
    # so a Mosaic lowering failure on hardware is RECORDED, not fatal
    from vcfc_tpu.ops.rle import rle_encode

    want_f, want_k = map(np.asarray, rle_encode(codes_np, S))
    variants = {}
    for name, fn in (
        ("swar2", lambda m, S_pad, BL: scan_blocked(m, S_pad, BL, 2)),
        ("swar4", lambda m, S_pad, BL: scan_blocked(m, S_pad, BL, 4)),
        ("swar2-strided", lambda m, S_pad, BL: scan_blocked_strided(m, S_pad, BL, 2)),
    ):
        try:
            f, k = grid(full_encode_with(fn))(codes)
            assert (np.asarray(f) == want_f).all(), f"{name} flag mismatch"
            assert (np.asarray(k).reshape(-1) == want_k).all(), f"{name} nseg"
            variants[name] = fn
            print(f"correctness: {name} flags byte-identical to the oracle")
        except Exception as e:  # noqa: BLE001 - lowering failure IS the datum
            msg = str(e).split("\n")[0][:200]
            print(f"REJECT {name}: does not lower/run on TPU: {type(e).__name__}: {msg}")

    t0 = report(
        "encode full", measure(kernel_step(grid(P._encode_kernel)), codes)
    )
    times = {}
    for name, fn in variants.items():
        times[name] = report(
            f"encode {name}",
            measure(kernel_step(grid(full_encode_with(fn))), codes),
        )

    def scan_only_with(run_start_fn):
        def kern(n_ref, codes_ref, flag_ref, nseg_ref):
            c = codes_ref[:].astype(jnp.int32)
            BL, S_pad = c.shape
            idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)
            m = run_start_fn(keys_of(c, idx), S_pad, BL)
            flag_ref[:] = (m & 0x7F).astype(jnp.uint8)
            nseg_ref[:] = m[:, :1]

        return kern

    report("scan-only full", measure(kernel_step(grid(scan_only_with(scan_full))), codes))
    for name, fn in variants.items():
        try:
            report(
                f"scan-only {name}",
                measure(kernel_step(grid(scan_only_with(fn))), codes),
            )
        except Exception as e:  # noqa: BLE001
            print(f"scan-only {name}: failed: {type(e).__name__}")

    if not times:
        print(
            "ALL SWAR variants fail to lower on TPU -> REJECT: the "
            "half-width lane relayout has no Mosaic-expressible form; "
            "the full-width scan ceiling stands (record in KERNEL_CEILING.md)"
        )
        return
    best_name = min(times, key=times.get)
    best = times[best_name]
    verdict = "ADOPT" if best < t0 * 0.85 else "REJECT (record the negative)"
    print(f"best SWAR ({best_name}) vs full: {best/t0:.2f}x of baseline -> {verdict}")


if __name__ == "__main__":
    main()
