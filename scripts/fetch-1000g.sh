#!/usr/bin/env bash
# Fetch the reference's real evaluation datasets — 1000 Genomes phase 3
# chr22 (and optionally chr1) genotypes — and stage them for the eval
# harness (VERDICT r1 #10; dataset definitions:
# /root/reference/evaluation/evaluation_main.py:36-64).
#
# NOTE: the build machine this framework was developed on has ZERO network
# egress, so this script cannot run there; it documents the exact recipe
# for any connected machine.  Expected checkable results on chr22 are
# recorded in docs/eval/EXPECTED-1000G.md.
#
# Usage: scripts/fetch-1000g.sh [data_dir] [chr22|chr1|both]
set -euo pipefail

data_dir="${1:-/mnt/ext4}"
which="${2:-chr22}"
base="https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/release/20130502"

fetch() {
  local chrom="$1"
  local name="ALL.${chrom}.phase3_shapeit2_mvncall_integrated_v5a.20130502.genotypes.vcf.gz"
  mkdir -p "$data_dir"
  cd "$data_dir"
  [ -f "$name" ] || curl -fLO "$base/$name"
  # the harness measures bgzip/tabix on the .gz directly and needs the
  # plain text for VCFC; keep both (chr22 ≈ 10.7 GB uncompressed)
  [ -f "${name%.gz}" ] || gunzip -k "$name"
}

run_eval() {
  local chrom="$1" ref="$2" min="$3" max="$4"
  local vcf="$data_dir/ALL.${chrom}.phase3_shapeit2_mvncall_integrated_v5a.20130502.genotypes.vcf"
  cd "$(dirname "$0")/.."
  for op in all-exhaustive-single all-exhaustive-range all-indexing-times; do
    python -m vcfc_tpu.eval "$op" measure \
      --vcf "$vcf" --reference-name "$ref" --min-pos "$min" --max-pos "$max" \
      --runs 5 --positions 200 --output-dir "docs/eval/1000g"
  done
}

case "$which" in
  chr22) fetch chr22; run_eval chr22 22 16050075 51244237 ;;
  chr1)  fetch chr1;  run_eval chr1  1  10177    249240543 ;;
  both)  fetch chr22; fetch chr1
         run_eval chr22 22 16050075 51244237
         run_eval chr1  1  10177    249240543 ;;
  *) echo "usage: $0 [data_dir] [chr22|chr1|both]" >&2; exit 1 ;;
esac
