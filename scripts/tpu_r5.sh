#!/usr/bin/env bash
# Round-5 TPU validation sweep (VERDICT r4 #1): everything that was
# blocked on the axon tunnel outage, in priority order, each leg under
# its own timeout so one hang cannot eat the window.  Run the moment
# `python -c "import jax; jax.devices()"` answers.
#
#   1. SWAR ceiling probe (VERDICT r3 #4 / r4 weak #2) -> adjudicate
#   2. TPU byte-identity: VCFZ_PACK=device encode v1-v8 + device decode
#      (incl. resolve_match_grid + v7/v8 sub-payload split) vs host bytes
#   3. VCFZ_COMPACT=device A/B (r5: sort_compact transfers vs dense D2H)
#   4. bench.py -> BENCH JSON with platform=TPU
#
# Usage: bash scripts/tpu_r5.sh [outdir]   (default /tmp/tpu_r5)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_r5}"
mkdir -p "$OUT"
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
# persist remote-TPU compiles across the sweep's processes (the scripts
# setdefault these too, but belt-and-braces for any direct jax import)
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/vcfc_tpu/jax"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES=all

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S), timeout ${tmo}s)" | tee -a "$OUT/sweep.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "   rc=$rc" | tee -a "$OUT/sweep.log"
  tail -3 "$OUT/$name.log" | sed 's/^/   /'
  return 0
}

# 0. reachability gate (fresh backend init can take ~40s compile)
if ! timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d"; then
  echo "TPU unreachable — aborting sweep" | tee -a "$OUT/sweep.log"
  exit 1
fi
echo "TPU reachable ($(date +%H:%M:%S))" | tee -a "$OUT/sweep.log"

# 1. SWAR ceiling probe
run swar_probe 1200 python scripts/swar_probe.py

# 2. TPU byte-identity of the device .vcfz routes (encode v1-v8, decode,
#    resolve) — small corpus so compile dominates, plus one mid corpus
run device_bytes 2400 python scripts/tpu_device_bytes.py

# 3. compaction A/B on the mid corpus
run compact_ab 2400 python scripts/tpu_compact_ab.py

# 4. the bench (writes its own JSON line; keep it last — it pins sync mode)
run bench 2400 python bench.py
grep -h '"metric"' "$OUT/bench.log" | tail -1 > "$OUT/BENCH_tpu.json" || true

echo "sweep done ($(date +%H:%M:%S)); logs in $OUT" | tee -a "$OUT/sweep.log"
