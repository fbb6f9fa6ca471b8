"""Kernel-ceiling evidence (VERDICT r2 #6): decompose the fused RLE
kernels' device time into scan vs non-scan work, and measure the fused
encode+decode roundtrip variant, at the bench shape (8192 x 2560).

jax.profiler does NOT work over the axon tunnel (a trace attempt hangs
indefinitely in start_trace; killed after 400 s), so the op-level
attribution is done by differential kernel variants timed with the
in-jit fori-loop method (CLAUDE.md timing traps):

  encode full            the shipped kernel
  encode scan-only       prefix-max scan kept, remainder/flag work cut
  encode scan-replaced   scan replaced by 2-op fake, all other work kept
  decode full            the shipped kernel (windowed 7-step scan)
  fused roundtrip        encode+decode in ONE kernel (no HBM round trip
                         for the flag plane) — the judge-suggested
                         scheduling experiment

Usage: python scripts/kernel_ceiling.py   (TPU; results in
docs/KERNEL_CEILING.md were produced by this script)
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

    # -- encode variants ---------------------------------------------------
    t_enc = report("encode full", measure(kernel_step(grid(P._encode_kernel)), codes))

    def enc_scan_only(n_ref, codes_ref, flag_ref, nseg_ref):
        c = codes_ref[:].astype(jnp.int32)
        BL, S_pad = c.shape
        idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)
        prev = P._shift_right(c, 1, -1)
        new_run = (c != prev) | (c == 4) | (prev == 4)
        mp = jnp.concatenate(
            [jnp.full((BL, 128), -1, jnp.int32), jnp.where(new_run, idx, -1)], axis=1
        )
        k = 1
        while k < 128:
            mp = jnp.maximum(mp, pltpu.roll(mp, k, axis=1))
            k *= 2
        m = mp[:, 128:]
        while k < S_pad:
            m = jnp.maximum(m, P._shift_right(m, k, -1))
            k *= 2
        flag_ref[:] = (m & 0x7F).astype(jnp.uint8)
        nseg_ref[:] = m[:, :1]

    report("encode scan-only", measure(kernel_step(grid(enc_scan_only)), codes))

    def enc_noscan(n_ref, codes_ref, flag_ref, nseg_ref):
        c = codes_ref[:].astype(jnp.int32)
        BL, S_pad = c.shape
        n = n_ref[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (BL, S_pad), 1)
        prev = P._shift_right(c, 1, -1)
        new_run = (c != prev) | (c == 4) | (prev == 4)
        run_start = jnp.where(new_run, idx, idx & ~127)  # 2-op fake scan
        d = idx - run_start
        rem = P._rem_mod_caps(d, c, S_pad)
        boundary = (rem == 0) & (idx < n)
        next_boundary = P._shift_left(boundary.astype(jnp.int32), 1, 0)
        last = (next_boundary > 0) | (idx == n - 1)
        base = jnp.where(
            c == 0, 0,
            jnp.where(c == 1, 0xA0, jnp.where(c == 2, 0xC0, jnp.where(c == 3, 0x80, 0xE0))),
        )
        flag_ref[:] = jnp.where(last, base | (rem + 1), 0).astype(jnp.uint8)
        nseg_ref[:] = boundary.sum(axis=1, dtype=jnp.int32, keepdims=True)

    t_rest = report("encode scan-replaced", measure(kernel_step(grid(enc_noscan)), codes))
    scan_ms = (t_enc - t_rest) * 1e3
    steps = 12  # 7 mask-free windowed + 5 masked full-width at S_pad=2560
    rate = steps * L * S * 2 / (t_enc - t_rest) / 1e12
    print(f"  -> pure scan ~{scan_ms:.3f} ms = {steps} log-steps; "
          f"~{rate:.1f} T i32 op/s sustained (roll+max pairs)")

    # -- decode ------------------------------------------------------------
    flags_np = np.asarray(P.pallas_rle_encode(codes, jnp.int32(S))[0])
    flags = jax.device_put(flags_np)

    def step_dec(c, i):
        dc, d = P.pallas_rle_decode(c, jnp.int32(S))
        c2 = (c ^ _opaque_mask(jnp, d[0])).astype(jnp.uint8)
        return c2, d[0] + jnp.int32(dc[0, 0])

    report("decode full", measure(step_dec, flags))

    # -- fused roundtrip (judge-suggested scheduling experiment) -----------
    def rt_kernel(n_ref, codes_ref, out_ref, dec_ref):
        f, nseg = P._encode_body(codes_ref[:].astype(jnp.int32), n_ref[0])
        code, decoded = P._decode_body(f.astype(jnp.int32), n_ref[0])
        out_ref[:] = code.astype(jnp.uint8)
        dec_ref[:] = decoded + nseg * 0

    dt = measure(kernel_step(grid(rt_kernel)), codes)
    report("fused roundtrip", dt)
    dc, d = grid(rt_kernel)(codes)
    assert (np.asarray(dc) == codes_np).all() and (np.asarray(d) == S).all()


if __name__ == "__main__":
    main()
