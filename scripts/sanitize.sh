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
  "$bin" compress-z "$work/f.vcfc" "$work/f5.vcfz" 5
  "$bin" decompress-z "$work/f5.vcfz" "$work/f5.z.vcf"
  cmp -s "$work/f.vcf" "$work/f5.z.vcf"
  "$bin" compress-z "$work/f.vcfc" "$work/f7.vcfz" 7
  "$bin" decompress-z "$work/f7.vcfz" "$work/f7.z.vcf"
  cmp -s "$work/f.vcf" "$work/f7.z.vcf"
  "$bin" query-z "$work/f7.vcfz" "1:10500-11500" > /dev/null
  "$bin" compress-z "$work/f.vcfc" "$work/f8.vcfz" 8
  "$bin" decompress-z "$work/f8.vcfz" "$work/f8.z.vcf"
  cmp -s "$work/f.vcf" "$work/f8.z.vcf"
  "$bin" query-z "$work/f8.vcfz" "1:10500-11500" > /dev/null
}

run_minihts_legs() {
  local bin="$1"
  local mh="$work/mh"
  mkdir -p "$mh"
  "$bin" bgzip -c "$work/f.vcf" > "$mh/f.vcf.gz"
  "$bin" tabix -p vcf "$mh/f.vcf.gz"
  "$bin" tabix "$mh/f.vcf.gz" "1:10500-11500" > /dev/null
  "$bin" bcftools view -O b -o "$mh/f.bcf" "$work/f.vcf"
  "$bin" bcftools index "$mh/f.bcf"
  "$bin" bcftools view -H "$mh/f.bcf" "1:10500-11500" > /dev/null
  "$bin" bcftools view -H "$mh/f.bcf" > /dev/null
  # crafted/corrupt inputs must die() cleanly (exit 1), never overflow:
  # truncated index tails, random-garbage indexes, a truncated BCF
  head -c 40 "$mh/f.vcf.gz.tbi" > "$mh/trunc.gz.tbi" || true
  cp "$mh/f.vcf.gz" "$mh/trunc.gz"
  if "$bin" tabix "$mh/trunc.gz" "1:1-2" >/dev/null 2>&1; then
    echo "FAIL: truncated .tbi accepted"; return 1
  fi
  python - "$mh" <<'PYEOF'
import os, sys, random
mh = sys.argv[1]
random.seed(7)
for name, src in [("garb.gz.tbi", "f.vcf.gz.tbi"), ("garb.bcf.csi", "f.bcf.csi"), ("garb.bcf", "f.bcf")]:
    data = bytearray(open(os.path.join(mh, src), "rb").read())
    for _ in range(64):
        data[random.randrange(len(data))] = random.randrange(256)
    open(os.path.join(mh, name), "wb").write(bytes(data))
# pair the garbage artifacts with intact data files
open(os.path.join(mh, "garb.gz"), "wb").write(open(os.path.join(mh, "f.vcf.gz"), "rb").read())
PYEOF
  # garbage runs may legitimately succeed (flips can land in dead bytes)
  # but must never crash with a sanitizer report (ASAN exits 1 with
  # "ERROR:" on stderr; die() prints "minihts:")
  # stderr is inspected REGARDLESS of exit code (the asan build also uses
  # -fno-sanitize-recover, so any finding aborts — double coverage)
  for probe in "tabix $mh/garb.gz 1:1-99999" \
               "bcftools view -H $mh/garb.bcf 1:1-99999" \
               "bcftools view -H $mh/garb.bcf"; do
    "$bin" $probe >/dev/null 2>"$mh/err" || true
    if grep -q "AddressSanitizer\|runtime error" "$mh/err"; then
      echo "FAIL: sanitizer report on crafted input: $probe"
      cat "$mh/err"
      return 1
    fi
  done
  cp "$mh/garb.bcf.csi" "$mh/f2.bcf.csi"; cp "$mh/f.bcf" "$mh/f2.bcf"
  "$bin" bcftools view -H "$mh/f2.bcf" "1:1-99999" >/dev/null 2>"$mh/err" || true
  if grep -q "AddressSanitizer\|runtime error" "$mh/err"; then
    echo "FAIL: sanitizer report on garbage .csi"; cat "$mh/err"; return 1
  fi
}

echo "== minihts ASAN+UBSAN (bgzip/tabix/bcf + crafted inputs)"
make -C "$here/native" minihts_asan >/dev/null
ASAN_OPTIONS=detect_leaks=0 run_minihts_legs "$here/native/minihts_asan"

run_vcfcq_corrupt_probes() {
  # bit-flipped .vcfc/.vcfci/.vcfz inputs: every verb that parses
  # untrusted files must die() or succeed — never crash with a
  # sanitizer report (the r1 advisor found exactly this class in the
  # codebook tables; keep it covered empirically)
  local bin="$1"
  local cw="$work/corrupt"
  mkdir -p "$cw"
  python - "$work" "$cw" "$seed" <<'PYEOF'
import random, shutil, sys
work, cw, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
random.seed(seed + 1)
for src, dst in [("f.vcfc", "c.vcfc"), ("f.vcfc.vcfci", "c.vcfc.vcfci"), ("f.vcfz", "c.vcfz"), ("f7.vcfz", "c7.vcfz"), ("f8.vcfz", "c8.vcfz")]:
    data = bytearray(open(f"{work}/{src}", "rb").read())
    for _ in range(48):
        data[random.randrange(len(data))] = random.randrange(256)
    open(f"{cw}/{dst}", "wb").write(bytes(data))
# pair the garbage index with an intact vcfc and vice versa
shutil.copy(f"{work}/f.vcfc", f"{cw}/g.vcfc")
shutil.copy(f"{cw}/c.vcfc.vcfci", f"{cw}/g.vcfc.vcfci")
PYEOF
  for probe in "decompress $cw/c.vcfc /dev/null" \
               "query $cw/c.vcfc 1:10000-99999" \
               "query-binned-index $cw/c.vcfc 1:10000-99999" \
               "query-binned-index $cw/g.vcfc 1:10000-99999" \
               "create-binned-index 50 $cw/c.vcfc" \
               "gap-analysis $cw/c.vcfc" \
               "decompress-z $cw/c.vcfz /dev/null" \
               "query-z $cw/c.vcfz 1:10000-99999" \
               "decompress-z $cw/c7.vcfz /dev/null" \
               "query-z $cw/c7.vcfz 1:10000-99999" \
               "decompress-z $cw/c8.vcfz /dev/null" \
               "query-z $cw/c8.vcfz 1:10000-99999"; do
    (cd "$cw" && "$bin" $probe >/dev/null 2>"$cw/err") || true
    if grep -q "AddressSanitizer\|runtime error\|ThreadSanitizer" "$cw/err"; then
      echo "FAIL: sanitizer report on corrupt input: vcfcq $probe"
      cat "$cw/err"
      return 1
    fi
  done
}

echo "== libvcfc_host ASAN+UBSAN (ctypes engine routes incl. text kernels)"
make -C "$here/native" libvcfc_host_asan.so >/dev/null
LD_PRELOAD="$(g++ -print-file-name=libasan.so) $(g++ -print-file-name=libubsan.so)" \
ASAN_OPTIONS=detect_leaks=0 \
VCFC_NATIVE_LIB="$here/native/libvcfc_host_asan.so" \
VCFC_REPO="$here" \
JAX_PLATFORMS=cpu VCFC_WORKERS=4 python - "$seed" <<'PYEOF'
import os, sys
sys.path.insert(0, os.environ["VCFC_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(sys.path[0], "tests"))
from test_fuzz import make_vcf
from vcfc_tpu import engine
from vcfc_tpu.format import compress_bytes
from vcfc_tpu.host import native
assert native.available(), "sanitized host library failed to load"
vcf = make_vcf(int(sys.argv[1]) % 1000 + 7, 300, 64, sv_every=7)
want = compress_bytes(vcf)
# all three decode/parse routes drive every .so entry point: scan,
# unpack, scan_packed, collect_escapes, classify, index_lines,
# measure/write, measure_render/render, gather_text, render_text
for env in ({}, {"VCFC_PARSE": "device"}, {"VCFC_UNPACK": "device"}):
    os.environ.update(env)
    assert engine.compress(vcf, force_device=True) == want
    assert engine.decompress(want, force_device=True) == vcf
    for k in env:
        os.environ.pop(k)
print("host-library sanitizer legs clean")
PYEOF

echo "== ASAN+UBSAN (single worker)"
ASAN_OPTIONS=detect_leaks=0 run_legs "$here/native/vcfcq_asan"
echo "== vcfcq ASAN+UBSAN corrupt-input probes"
ASAN_OPTIONS=detect_leaks=0 run_vcfcq_corrupt_probes "$here/native/vcfcq_asan"
echo "== ASAN+UBSAN (VCFC_WORKERS=8)"
ASAN_OPTIONS=detect_leaks=0 VCFC_WORKERS=8 run_legs "$here/native/vcfcq_asan"
echo "== TSAN (VCFC_WORKERS=8)"
VCFC_WORKERS=8 run_legs "$here/native/vcfcq_tsan"
echo "PASS: sanitizers clean (seed $seed)"
