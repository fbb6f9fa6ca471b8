"""Microbenchmark: encode vs decode, Pallas vs XLA, on the current backend.

Usage: python scripts/profile_kernels.py [L] [S]
Prints per-phase ms and GB/s of genotype text (4 B/cell).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


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
        dt_e, (flag, nseg) = timeit(lambda c: enc(c, n), codes)
        dt_d, _ = timeit(lambda f: dec(f, n), flag)
        print(
            f"{name:7s} encode {dt_e*1e3:7.2f} ms ({text_gb/dt_e:7.1f} GB/s)   "
            f"decode {dt_d*1e3:7.2f} ms ({text_gb/dt_d:7.1f} GB/s)   "
            f"combined {text_gb/(dt_e+dt_d):7.1f} GB/s"
        )


if __name__ == "__main__":
    main()
