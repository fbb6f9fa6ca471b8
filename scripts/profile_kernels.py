"""Microbenchmark: encode vs decode, Pallas vs XLA, on the current backend.

Usage: python scripts/profile_kernels.py [L] [S]
Prints per-phase ms and GB/s of genotype text (4 B/cell).

Timing method (CLAUDE.md "Axon tunnel timing traps"): K iterations run
inside ONE jitted ``lax.fori_loop`` and the K=1 dispatch cost is
subtracted — on this machine per-dispatch RPC is ~2.3 ms and
``block_until_ready`` does not reliably wait in async mode, so a
host-side timing loop would measure the tunnel, not the kernels.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 51


def device_time(step, x, iters):
    """Seconds per step, pure device time via in-jit loop subtraction."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(x):
            def body(i, carry):
                x_in, acc = carry
                outs = step(x_in)
                # thread x through an always-false-mask XOR so the body
                # stays loop-variant (else XLA hoists it and the
                # measurement reads ~zero).  The predicate must be
                # RUNTIME-opaque: a provably-false compare like
                # `u8 > 255` gets folded and the hoist comes back
                # (observed: negative decode times).
                mask = jnp.int32(outs[1].reshape(-1)[0]) == jnp.int32(-0x7EAD)
                x_next = (x_in ^ mask.astype(x_in.dtype)).astype(x_in.dtype)
                acc = acc ^ (
                    jnp.int32(outs[0].reshape(-1)[0])
                    + jnp.int32(outs[1].reshape(-1)[0])
                    + i
                )
                return (x_next, acc)

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.int32(0)))
            return acc

        return run

    def timed(fn, reps=3):
        jax.block_until_ready(fn(x))  # compile/warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(make(iters)) - timed(make(1))) / (iters - 1)


def main():
    import jax

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 2560
    rng = np.random.default_rng(0)
    codes_np = rng.choice(5, size=(L, S), p=[0.81, 0.072, 0.072, 0.0264, 0.0196]).astype(
        np.uint8
    )
    codes = jax.device_put(codes_np)
    n = np.int32(S)
    text_gb = L * S * 4 / 1e9

    from vcfc_tpu.ops.rle import rle_decode, rle_encode

    kernels = {"xla": (rle_encode, rle_decode)}
    if jax.devices()[0].platform == "tpu":
        from vcfc_tpu.ops.pallas_rle import pallas_rle_decode, pallas_rle_encode

        kernels["pallas"] = (pallas_rle_encode, pallas_rle_decode)

    for name, (enc, dec) in kernels.items():
        flag, _ = enc(codes, n)
        flag = jax.device_put(np.asarray(flag))
        dt_e = device_time(lambda c: enc(c, n), codes, K)
        dt_d = device_time(lambda f: dec(f, n), flag, K)
        print(
            f"{name:7s} encode {dt_e*1e3:7.2f} ms ({text_gb/dt_e:7.1f} GB/s)   "
            f"decode {dt_d*1e3:7.2f} ms ({text_gb/dt_d:7.1f} GB/s)   "
            f"combined {text_gb/(dt_e+dt_d):7.1f} GB/s"
        )


if __name__ == "__main__":
    main()
