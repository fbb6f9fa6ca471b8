"""Gene-region lookup benchmark.

Mirrors the reference's evaluation/query.py (gene-region latencies over
TP53, BRCA1/2, APOE, ... with Ensembl-resolved coordinates, 3 iterations).
This environment has no network egress, so the GRCh37 coordinates the
reference would resolve from Ensembl are embedded.
"""

from __future__ import annotations

import json
import statistics
import time

# GRCh37 gene coordinates (chrom, start, end) — the gene panel used by the
# reference harness (evaluation/query.py:144-222)
GENE_REGIONS_GRCH37: dict[str, tuple[str, int, int]] = {
    "TP53": ("17", 7_565_097, 7_590_856),
    "BRCA1": ("17", 41_196_312, 41_277_500),
    "BRCA2": ("13", 32_889_611, 32_973_805),
    "APOE": ("19", 45_409_039, 45_412_650),
    "CFTR": ("7", 117_120_017, 117_308_719),
    "HBB": ("11", 5_246_696, 5_248_301),
    "LDLR": ("19", 11_200_038, 11_244_506),
    "APP": ("21", 27_252_861, 27_543_446),
    "TNF": ("6", 31_543_344, 31_546_113),
    "EGFR": ("7", 55_086_725, 55_324_313),
}


def measure_gene_queries(
    vcfc: bytes,
    vcfci: bytes,
    genes: dict[str, tuple[str, int, int]] | None = None,
    iterations: int = 3,
) -> dict:
    """Time binned-index queries over the gene panel."""
    from ..index.binned import query_binned_index
    from ..query.coordinate import CoordinateQuery

    genes = genes or GENE_REGIONS_GRCH37
    out: dict = {}
    for name, (chrom, start, end) in genes.items():
        q = CoordinateQuery.range(chrom, start, end)
        times = []
        n_bytes = 0
        for _ in range(iterations):
            t0 = time.perf_counter()
            n_bytes = sum(len(l) for l in query_binned_index(vcfc, vcfci, q))
            times.append(time.perf_counter() - t0)
        out[name] = {
            "region": f"{chrom}:{start}-{end}",
            "p50_s": statistics.median(times),
            "min_s": min(times),
            "result_bytes": n_bytes,
        }
    return out


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("vcfc")
    p.add_argument("--iterations", type=int, default=3)
    args = p.parse_args(argv)
    with open(args.vcfc, "rb") as f:
        vcfc = f.read()
    with open(args.vcfc + ".vcfci", "rb") as f:
        vcfci = f.read()
    print(json.dumps(measure_gene_queries(vcfc, vcfci, iterations=args.iterations), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
