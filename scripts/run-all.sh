#!/usr/bin/env bash
# Run every harness operation for a dataset (reference analog: run-all.sh).
# usage: run-all.sh [extra vcfc_tpu.eval args...]
set -euo pipefail
for op in all-indexing-times binned-index-creation-time \
          all-exhaustive-single all-exhaustive-range \
          binned-timing-profile-single binned-timing-profile-range; do
  echo "== $op"
  python -m vcfc_tpu.eval "$op" measure "$@"
done
