"""Benchmark entry point: prints ONE JSON line.

Measures steady-state device RLE encode+decode throughput on a realistic
1000-Genomes-like genotype distribution (81% 0|0; escape tail), in GB of
genotype text (4 ASCII bytes per sample field) per second per chip.

Baseline: the reference C++ binary (main_release, -O3) on this machine
compresses+decompresses a 2504-sample x 5000-variant synthetic VCF at a
combined 0.047 GB/s single-core (compress 0.063 GB/s + decompress
0.183 GB/s; see BASELINE.md).  vs_baseline is our combined throughput
over that anchor.
"""

from __future__ import annotations

import json
import time

import numpy as np

# reference main_release combined encode+decode GB/s on this machine
BASELINE_COMBINED_GBPS = 0.047


def main() -> None:
    import jax

    from vcfc_tpu.engine import _kernels

    rle_encode, rle_decode = _kernels(2560)

    L, S = 8192, 2560  # ~21M genotype cells per dispatch
    rng = np.random.default_rng(0)
    # 1000G-like distribution incl. escape tail
    codes_np = rng.choice(
        5, size=(L, S), p=[0.81, 0.072, 0.072, 0.0264, 0.0196]
    ).astype(np.uint8)
    codes = jax.device_put(codes_np)
    n = np.int32(S)

    def step(c):
        flagpos, nseg = rle_encode(c, n)
        dec_codes, decoded = rle_decode(flagpos, n)
        return flagpos, nseg, dec_codes, decoded

    # warmup / compile
    out = step(codes)
    jax.block_until_ready(out)

    # correctness gate inside the bench: decode must invert encode
    dec = np.asarray(out[2])
    assert (dec == codes_np).all(), "roundtrip mismatch on device"
    assert (np.asarray(out[3]) == S).all()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(codes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    gt_bytes = L * S * 4  # ASCII size of the genotype region
    gbps = gt_bytes / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "genotype_encode_decode_GBps_per_chip",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_COMBINED_GBPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
