"""Debug-output flavor (reference parity: the `main_debug` build).

The reference compiles a separate binary with `#define DEBUG`
(src/utils.hpp:17-24) whose ~90 `debugf` sites trace per-line codec
decisions — reference name/position, required-length updates, per-run
counts (compress.cpp:69,95,141,158...).  Its debugf writes to STDOUT,
which corrupts the compressed output stream (the reason SURVEY §2 calls
the flavor an artifact).  Here the same diagnostics are an ENV FLAG,
not a build flavor — `VCFC_DEBUG=1` — and they write to STDERR, so the
byte contract holds even with tracing on (conscious divergence,
documented; stdout purity is pinned by tests).

Tracing hooks live in the ORACLE codec paths (format/lines.py,
format/vcf.py): the per-line/per-run story the reference's debug build
tells is inherently scalar, and the oracle is the scalar twin every
fast path is validated against.  Zero overhead when disabled (module
flag checked once per call site).
"""

from __future__ import annotations

import os
import sys


def enabled() -> bool:
    return os.environ.get("VCFC_DEBUG") == "1"


def debugf(fmt: str, *args) -> None:
    """stderr twin of the reference's debugf (utils.hpp:20)."""
    if enabled():
        sys.stderr.write(fmt % args if args else fmt)
