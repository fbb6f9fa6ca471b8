#!/usr/bin/env bash
# Regenerate all figures from measured JSONs (reference analog: graph-all.sh).
set -euo pipefail
for op in all-indexing-times binned-index-creation-time \
          all-exhaustive-single all-exhaustive-range \
          binned-timing-profile-single binned-timing-profile-range; do
  python -m vcfc_tpu.eval "$op" graph "$@" || true
done
