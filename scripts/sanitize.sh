#!/usr/bin/env bash
# Sanitizer gauntlet for the native runtime (the reference has no
# sanitizer story at all — SURVEY.md §5; ours is thread-parallel, so
# TSAN coverage of the multi-worker paths is part of the test pyramid).
#
#   ASAN+UBSAN: compress / decompress / queries / compress-z round trip
#   TSAN:       the same with VCFC_WORKERS=8 forcing real thread fan-out
#
# Usage: scripts/sanitize.sh [seed]
set -euo pipefail

here="$(cd "$(dirname "$0")/.." && pwd)"
seed="${1:-$RANDOM}"
work="$(mktemp -d /tmp/vcfc-sanitize.XXXXXX)"
trap 'rm -rf "$work"' EXIT
echo "workdir: $work  seed: $seed"

make -C "$here/native" vcfcq_asan vcfcq_tsan >/dev/null

export PYTHONPATH="$here${PYTHONPATH:+:$PYTHONPATH}"
python - "$seed" "$work/f.vcf" <<'EOF'
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(sys.argv[0]))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from vcfc_tpu.eval.random_vcf import generate_correlated_vcf
vcf = generate_correlated_vcf(300, 1500, mutation_rate=0.05, seed=int(sys.argv[1]))
open(sys.argv[2], "wb").write(vcf)
EOF

run_legs() {
  local bin="$1"
  "$bin" compress "$work/f.vcf" "$work/f.vcfc"
  "$bin" decompress "$work/f.vcfc" "$work/f.rt.vcf"
  cmp -s "$work/f.vcf" "$work/f.rt.vcf"
  "$bin" create-binned-index 50 "$work/f.vcfc"
  "$bin" query-binned-index "$work/f.vcfc" "1:10500-11500" > /dev/null
  "$bin" query "$work/f.vcfc" "1:10000-12000" > /dev/null
  "$bin" compress-z "$work/f.vcfc" "$work/f.vcfz" 4
  "$bin" decompress-z "$work/f.vcfz" "$work/f.z.vcf"
  cmp -s "$work/f.vcf" "$work/f.z.vcf"
  "$bin" query-z "$work/f.vcfz" "1:10500-11500" > /dev/null
}

echo "== ASAN+UBSAN (single worker)"
ASAN_OPTIONS=detect_leaks=0 run_legs "$here/native/vcfcq_asan"
echo "== ASAN+UBSAN (VCFC_WORKERS=8)"
ASAN_OPTIONS=detect_leaks=0 VCFC_WORKERS=8 run_legs "$here/native/vcfcq_asan"
echo "== TSAN (VCFC_WORKERS=8)"
VCFC_WORKERS=8 run_legs "$here/native/vcfcq_tsan"
echo "PASS: sanitizers clean (seed $seed)"
