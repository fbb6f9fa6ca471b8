"""Bound the minihts tabix stand-in (VERDICT r2 #4b).

The eval's tabix-bgzip rows run against the in-tree from-spec minihts
when no real htslib is on PATH.  Correctness is gauntlet-covered; this
script bounds its WALL TIME so a pathological code path (e.g. a
per-query full index parse) can't silently inflate the VCFC advantage:

  spawn_ms           bare process spawn+exit (usage path, no I/O)
  miss_query_ms      spawn + .tbi load + binary search, zero data reads
                     (query beyond the data range)
  hit_query_ms_p50   full point query (spawn + index + seek + inflate +
                     scan + emit) at the eval harness's positions/seed
  full_scan_*        whole-chromosome query streamed to /dev/null: the
                     inflate+scan path over every BGZF block
  zlib_inflate_MBps  python-zlib decompress of the same .vcf.gz — the
                     known-good reference rate for the same deflate
                     streams (~300-500 MB/s machine class)

Sanity gate: minihts's full-scan inflate rate must be within ~3x of raw
zlib (it also parses + emits text, so parity is not expected).  If that
holds, per-query time decomposes as miss_query (fixed costs) + a data
term at a sane inflate rate — no hidden pathology.

Usage: python scripts/minihts_breakdown.py [workdir] [out.json]
(defaults: eval-work docs/eval/minihts-breakdown.json)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _best(cmd, reps=7, stdout=subprocess.DEVNULL):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        subprocess.run(cmd, stdout=stdout, stderr=subprocess.DEVNULL)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "eval-work"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "docs/eval/minihts-breakdown.json"
    )
    here = os.path.dirname(os.path.abspath(__file__))
    tabix = os.path.join(here, "..", "native", "htsbin", "tabix")
    gz = os.path.join(workdir, "cohort.vcf.gz")
    if not (os.path.exists(tabix) and os.path.exists(gz)):
        print("need native/htsbin/tabix and eval-work/cohort.vcf.gz", file=sys.stderr)
        return 1

    spawn = _best([tabix])  # usage path: no file I/O at all

    # beyond-data query: index loads + binary search, no chunk reads
    miss = _best([tabix, gz, "1:999999990-999999999"])

    # the harness's own position sample (eval/harness.py::_positions seed)
    rng = np.random.default_rng(11)
    positions = rng.integers(10_000, 19_998, size=40).tolist()
    hits = []
    for pos in positions:
        hits.append(_best([tabix, gz, f"1:{pos}-{pos}"], reps=3))
    hit_p50 = statistics.median(hits)
    hit_p99 = sorted(hits)[max(0, -(-99 * len(hits) // 100) - 1)]

    # full chromosome: every BGZF block inflates + scans + emits
    full = _best([tabix, gz, "1"], reps=3)

    # raw zlib on the same file (BGZF = concatenated gzip members)
    raw = open(gz, "rb").read()
    t0 = time.perf_counter()
    total = 0
    off = 0
    while off < len(raw):
        d = zlib.decompressobj(31)
        total += len(d.decompress(raw[off:]))
        off = len(raw) - len(d.unused_data)
        if not d.eof:
            break
    zlib_dt = time.perf_counter() - t0
    zlib_rate = total / zlib_dt / 1e6
    scan_rate = total / max(full - miss, 1e-9) / 1e6

    out = {
        "tool": "native/minihts (tabix stand-in)",
        "dataset_gz_bytes": len(raw),
        "dataset_text_bytes": total,
        "spawn_ms": round(spawn * 1e3, 3),
        "index_load_ms": round((miss - spawn) * 1e3, 3),
        "miss_query_ms": round(miss * 1e3, 3),
        "hit_query_ms_p50": round(hit_p50 * 1e3, 3),
        "hit_query_ms_p99": round(hit_p99 * 1e3, 3),
        "full_scan_ms": round(full * 1e3, 2),
        "full_scan_inflate_MBps": round(scan_rate, 1),
        "zlib_inflate_MBps": round(zlib_rate, 1),
        "inflate_ratio_vs_zlib": round(zlib_rate / scan_rate, 2),
        "sane": bool(zlib_rate / scan_rate < 3.0),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
