"""Multi-host driver.

  compress:   python -m vcfc_tpu.parallel <in.vcf>  <out.vcfc|.vcfz>
  decompress: python -m vcfc_tpu.parallel <in.vcfc|.vcfz> <out.vcf>
  query:      python -m vcfc_tpu.parallel <in.vcfc> <out.txt> --query <ref>:<s>-<e>
              (a <in.vcfc>.vcfcm manifest beside the input prunes the
               scan: only candidate lines are decoded)

Launch once per host/process with coordinator env vars (or flags):
  VCFC_COORDINATOR=host:port  VCFC_NUM_PROCESSES=N  VCFC_PROCESS_ID=i
Single-process without any of them (degrades to a local run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .distributed import (
    compress_multihost,
    compress_multihost_vcfz,
    decompress_multihost,
    decompress_multihost_vcfz,
    initialize,
    query_multihost,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vcfc_tpu.parallel", description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--coordinator", default=os.environ.get("VCFC_COORDINATOR"))
    p.add_argument(
        "--num-processes",
        type=int,
        default=int(os.environ.get("VCFC_NUM_PROCESSES", "0")) or None,
    )
    p.add_argument(
        "--process-id",
        type=int,
        default=(
            int(os.environ["VCFC_PROCESS_ID"])
            if "VCFC_PROCESS_ID" in os.environ
            else None
        ),
    )
    p.add_argument(
        "--query",
        default=None,
        help="cooperative full-scan query region over a .vcfc input",
    )
    p.add_argument(
        "--vcfz-version",
        type=int,
        default=None,
        choices=(3, 4),
        help=".vcfz version for .vcfz outputs (4 = vertical prediction)",
    )
    args = p.parse_args(argv)
    if args.vcfz_version is not None and not args.output.endswith(".vcfz"):
        p.error("--vcfz-version only applies to .vcfz outputs")

    initialize(args.coordinator, args.num_processes, args.process_id)
    if args.query is not None:
        stats = query_multihost(args.input, args.query, args.output)
    elif args.output.endswith(".vcfz"):
        stats = compress_multihost_vcfz(
            args.input, args.output, version=args.vcfz_version or 3
        )
    elif args.input.endswith(".vcfz"):
        stats = decompress_multihost_vcfz(args.input, args.output)
    elif args.input.endswith(".vcfc"):
        stats = decompress_multihost(args.input, args.output)
    else:
        stats = compress_multihost(args.input, args.output)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
