"""Research analyses.

Reimplements the reference's one-off analysis scripts (SURVEY.md C25):

  genotype-counts    GT frequency map of a VCF -> JSON
                     (other/genotype_analysis.py)
  gap-analysis-plot  histograms of compressed line lengths and
                     filesystem-block fragmentation from the
                     start-positions.txt emitted by the gap-analysis CLI
                     action (other/gap_analysis.py)
  repetitions        per-GT run-length histograms + RLE savings estimate:
                     each run element saves 4 bytes of text at the cost of
                     1 flag byte per run (analysis/repetition-analysis.py:47-59)

All ops work on files or stdin and print JSON; plots are optional.
"""

from __future__ import annotations

import json
import sys
from collections import Counter, defaultdict


def genotype_counts(vcf_stream) -> dict[str, int]:
    counts: Counter[str] = Counter()
    for raw in vcf_stream:
        if raw.startswith(b"#"):
            continue
        cols = raw.strip().split(b"\t")
        counts.update(c.decode("ascii", "replace") for c in cols[9:])
    return dict(counts)


def run_length_histograms(vcf_stream) -> dict[str, dict[int, int]]:
    """Per-genotype histogram of run lengths across all data lines."""
    hists: dict[str, Counter[int]] = defaultdict(Counter)
    for raw in vcf_stream:
        if raw.startswith(b"#"):
            continue
        cols = raw.strip().split(b"\t")[9:]
        if not cols:
            continue
        run_val, run_len = cols[0], 1
        for c in cols[1:]:
            if c == run_val:
                run_len += 1
            else:
                hists[run_val.decode("ascii", "replace")][run_len] += 1
                run_val, run_len = c, 1
        hists[run_val.decode("ascii", "replace")][run_len] += 1
    return {k: dict(v) for k, v in hists.items()}


def rle_savings(hists: dict[str, dict[int, int]], original_size: int) -> dict:
    """Compression-savings proxy, exactly the reference's calc_savings
    (repetition-analysis.py:47-59): every run element saves 4-1 = 3 bytes
    ("GT\\t" text -> share of one flag byte).  Like the reference it is an
    approximation — escape genotypes and the 127/31 run caps are ignored
    — kept identical for figure comparability."""
    saved = 0
    total_runs = 0
    for gt, hist in hists.items():
        for run_len, count in hist.items():
            saved += count * int(run_len) * 3
            total_runs += count
    return {
        "total_runs": total_runs,
        "bytes_saved": saved,
        "original_size": original_size,
        "savings_fraction": saved / original_size if original_size else 0.0,
    }


def gap_analysis_stats(start_positions_stream) -> dict:
    """Summarize the `gap-analysis` output: per line `pos decoded_size
    compressed_size` (query/engine.gap_analysis; reference
    main.cpp:3947-3975), incl. 4KiB filesystem-block fragmentation."""
    positions, decoded, compressed = [], [], []
    for raw in start_positions_stream:
        parts = raw.split()
        if len(parts) != 3:
            continue
        positions.append(int(parts[0]))
        decoded.append(int(parts[1]))
        compressed.append(int(parts[2]))
    n = len(positions)
    if n == 0:
        return {"lines": 0}
    block = 4096
    # model lines packed from a block-aligned base; the real stream's
    # meta/header prefix shifts every offset equally, so pass data_offset
    # when absolute alignment matters
    offsets = [0]
    for c in compressed[:-1]:
        offsets.append(offsets[-1] + c)
    straddles = sum(
        1 for off, c in zip(offsets, compressed) if off // block != (off + c - 1) // block
    )
    return {
        "lines": n,
        "compressed_total": sum(compressed),
        "decoded_total": sum(decoded),
        "mean_compressed": sum(compressed) / n,
        "mean_decoded": sum(decoded) / n,
        "ratio": sum(decoded) / sum(compressed),
        "block_straddle_fraction": straddles / n,
    }


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(
            "usage: analysis genotype-counts|repetitions|gap-analysis-plot [file]",
            file=sys.stderr,
        )
        return 1
    cmd, rest = argv[0], argv[1:]

    def open_bin():
        return open(rest[0], "rb") if rest else sys.stdin.buffer

    if cmd == "genotype-counts":
        with open_bin() as f:
            print(json.dumps(genotype_counts(f), indent=2, sort_keys=True))
    elif cmd == "repetitions":
        import os

        with open_bin() as f:
            hists = run_length_histograms(f)
        size = os.path.getsize(rest[0]) if rest else 0
        print(json.dumps({"histograms": hists, "savings": rle_savings(hists, size)}, indent=2))
    elif cmd == "gap-analysis-plot":
        path = rest[0] if rest else "start-positions.txt"
        with open(path) as f:
            print(json.dumps(gap_analysis_stats(f), indent=2))
    else:
        print(f"unknown command: {cmd}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
