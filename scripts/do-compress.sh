#!/usr/bin/env bash
# Roundtrip correctness check (reference analog: do-compress.sh):
# compress -> hexdump preview -> decompress -> byte-compare.
set -euo pipefail
in=${1:?usage: do-compress.sh <input.vcf>}
vcfc=${in%.vcf}.vcfc
rt=${in%.vcf}.roundtrip.vcf
python -m vcfc_tpu.cli compress "$in" "$vcfc"
od -A x -t x1z "$vcfc" | head -20
python -m vcfc_tpu.cli decompress "$vcfc" "$rt"
cmp "$in" "$rt" && echo "roundtrip OK: $in"
