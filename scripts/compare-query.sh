#!/usr/bin/env bash
# Time tabix vs vcfc_tpu binned-index query on a region (reference analog:
# compare-query.sh; its unquoted-region argv bug is fixed here).
set -euo pipefail
vcfc=${1:?usage: compare-query.sh <file.vcfc> <region> [vcf.gz]}
region=${2:?region, e.g. 22:23521891-23660224}
gz=${3:-}
sync || true
[ -w /proc/sys/vm/drop_caches ] && echo 3 > /proc/sys/vm/drop_caches || true
if [ -n "$gz" ] && command -v tabix >/dev/null; then
  time tabix "$gz" "$region" > /tmp/tabix-result.txt
fi
# prefer the native CLI (no interpreter startup in the timing)
here="$(cd "$(dirname "$0")/.." && pwd)"
if [ -x "$here/native/vcfcq" ]; then
  cli=("$here/native/vcfcq")
else
  cli=(python -m vcfc_tpu.cli)
fi
[ -f "$vcfc.vcfci" ] || "${cli[@]}" create-binned-index 150 "$vcfc"
time "${cli[@]}" query-binned-index "$vcfc" "$region" > /tmp/vcfc-result.txt
wc -l /tmp/*-result.txt 2>/dev/null || true
