#!/usr/bin/env bash
# Wrap one measure op with tee logging (reference analog: timing.sh).
set -euo pipefail
op=${1:?usage: timing.sh <operation> [args...]}; shift
mkdir -p eval-out
python -m vcfc_tpu.eval "$op" measure "$@" 2>&1 | tee "eval-out/$op.log"
