"""uniqc: token counting / run-length statistics over stdin.

Reimplements the reference's standalone analysis tool (src/uniqc.cpp):

  counts          global token histogram, sorted lexicographically
  counts-by-line  per-line token histogram, sorted lexicographically
  runs-by-line    run-length encoding of each line's tokens, in order

Tokens are whitespace-separated.  Output lines are "<token> <count>".
Feeds the genotype-run analyses (SURVEY.md C20/C25).
"""

from __future__ import annotations

import sys
from collections import Counter


def do_counts(stream) -> None:
    counts: Counter[str] = Counter()
    for line in stream:
        counts.update(line.split())
    for token in sorted(counts):
        print(f"{token} {counts[token]}")


def do_counts_by_line(stream) -> None:
    for line in stream:
        counts = Counter(line.split())
        for token in sorted(counts):
            print(f"{token} {counts[token]}")


def do_runs_by_line(stream) -> None:
    for line in stream:
        tokens = line.split()
        if not tokens:
            continue
        run_term, run_length = tokens[0], 1
        for term in tokens[1:]:
            if term == run_term:
                run_length += 1
            else:
                print(f"{run_term} {run_length}")
                run_term, run_length = term, 1
        print(f"{run_term} {run_length}")


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: uniqc counts|counts-by-line|runs-by-line", file=sys.stderr)
        return 1
    cmd = argv[0]
    if cmd == "counts":
        do_counts(sys.stdin)
    elif cmd == "counts-by-line":
        do_counts_by_line(sys.stdin)
    elif cmd == "runs-by-line":
        do_runs_by_line(sys.stdin)
    else:
        raise RuntimeError(f"Unknown command: {cmd}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
