"""Seeded synthetic VCF generator.

Workload-compatible reimplementation of the reference's generator
(other/random_vcf.py:1-75): GT-only FORMAT, allele distribution
{0: 0.90, 1: 0.08, 2: 0.02} per haplotype (so ~81% "0|0" and a ~4%
escape tail of genotypes containing allele 2), seeded for
reproducibility.  Uses numpy vectorized sampling instead of the
reference's per-call ``random.random()`` loop, so byte streams differ
from the reference generator for the same seed while the statistical
workload is identical.
"""

from __future__ import annotations

import math

import numpy as np

BASES = ["A", "T", "G", "C"]


def generate_vcf(
    sample_count: int = 1000,
    variant_count: int = 1_000_000,
    alt_count: int = 2,  # like the reference, allele_probs stay (0,1,2)-valued
    # even for alt_count=1 (other/random_vcf.py:66-67 hardcodes alt_vals)
    seed: int = 5,
    chrom: str = "1",
    start_pos: int = 10_000,
    pos_step: int = 2,
    allele_probs: tuple[float, ...] = (0.90, 0.08, 0.02),
) -> bytes:
    rng = np.random.default_rng(seed)
    out = bytearray()
    out += b"##fileformat=VCFv4.1\n"
    out += b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
    out += b"##fileDate=20150218\n"
    header = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
    digits = max(int(math.ceil(math.log10(max(sample_count, 2)))), 1)
    header += [f"HG{j:0{digits}d}" for j in range(sample_count)]
    out += "\t".join(header).encode() + b"\n"

    alleles = np.arange(len(allele_probs))
    # pre-render the genotype byte patterns "a|b"
    gt_bytes = np.zeros((len(allele_probs), len(allele_probs), 4), np.uint8)
    for a in alleles:
        for b in alleles:
            gt_bytes[a, b] = np.frombuffer(f"{a}|{b}\t".encode(), np.uint8)

    pos = start_pos
    for i in range(variant_count):
        ref = BASES[rng.integers(len(BASES))]
        alts = [b for b in BASES if b != ref]
        rng.shuffle(alts)
        alts = alts[:alt_count]
        prefix = "\t".join(
            [chrom, str(pos), f"var{i}", ref, ",".join(alts), "100", "PASS", "INFO", "GT"]
        )
        a1 = rng.choice(alleles, size=sample_count, p=allele_probs)
        a2 = rng.choice(alleles, size=sample_count, p=allele_probs)
        row = gt_bytes[a1, a2].reshape(-1)[:-1]  # drop trailing tab
        out += prefix.encode() + b"\t" + row.tobytes() + b"\n"
        pos += pos_step
    return bytes(out)


def generate_correlated_vcf(
    sample_count: int = 1000,
    variant_count: int = 10_000,
    seed: int = 5,
    chrom: str = "1",
    start_pos: int = 10_000,
    pos_step: int = 2,
    mutation_rate: float = 0.03,
    allele_probs: tuple[float, ...] = (0.90, 0.08, 0.02),
) -> bytes:
    """LD-correlated synthetic cohort: each variant line copies the
    previous line's genotype per sample with probability
    ``1 - mutation_rate``, else redraws from the base distribution.

    Real population data (e.g. the 1000 Genomes chromosomes the
    reference benchmarks on, evaluation_main.py:36-64) has exactly this
    structure — consecutive variants are in linkage disequilibrium, so
    sample columns change slowly down the file.  The i.i.d. generator
    above has no vertical structure at all; this one exists to measure
    cross-variant modeling (.vcfz v4) on a realistic correlation
    profile."""
    if len(allele_probs) > 3:
        # the ALT column lists two alternates; allele indexes beyond 2
        # would reference nonexistent alleles (same constraint as
        # generate_vcf / the reference's hardcoded alt_vals)
        raise ValueError("allele_probs supports at most 3 alleles")
    rng = np.random.default_rng(seed)
    out = bytearray()
    out += b"##fileformat=VCFv4.1\n"
    out += b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
    out += b"##fileDate=20150218\n"
    header = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
    digits = max(int(math.ceil(math.log10(max(sample_count, 2)))), 1)
    header += [f"HG{j:0{digits}d}" for j in range(sample_count)]
    out += "\t".join(header).encode() + b"\n"

    alleles = np.arange(len(allele_probs))
    gt_bytes = np.zeros((len(allele_probs), len(allele_probs), 4), np.uint8)
    for a in alleles:
        for b in alleles:
            gt_bytes[a, b] = np.frombuffer(f"{a}|{b}\t".encode(), np.uint8)

    a1 = rng.choice(alleles, size=sample_count, p=allele_probs)
    a2 = rng.choice(alleles, size=sample_count, p=allele_probs)
    pos = start_pos
    for i in range(variant_count):
        if i:
            redraw = rng.random(sample_count) < mutation_rate
            n_new = int(redraw.sum())
            if n_new:
                a1 = a1.copy()
                a2 = a2.copy()
                a1[redraw] = rng.choice(alleles, size=n_new, p=allele_probs)
                a2[redraw] = rng.choice(alleles, size=n_new, p=allele_probs)
        ref = BASES[rng.integers(len(BASES))]
        alts = [b for b in BASES if b != ref]
        prefix = "\t".join(
            [chrom, str(pos), f"var{i}", ref, ",".join(alts[:2]), "100", "PASS", "INFO", "GT"]
        )
        row = gt_bytes[a1, a2].reshape(-1)[:-1]
        out += prefix.encode() + b"\t" + row.tobytes() + b"\n"
        pos += pos_step
    return bytes(out)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--variants", type=int, default=1_000_000)
    p.add_argument("--alt-count", type=int, default=2)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    out = args.output or f"test-{args.samples}-{args.variants}.vcf"
    data = generate_vcf(args.samples, args.variants, args.alt_count, args.seed)
    with open(out, "wb") as f:
        f.write(data)
    print(f"finished writing {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
