"""Evaluation harness configuration.

The reference hard-codes its datasets and knobs in evaluation_main.py
(:28-64: test_runs=5, default bin 150, 1000 Genomes chr22/chr1 on
/mnt/{ext4,xfs}); here they are dataclasses with a synthetic default so
the harness runs anywhere.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class Dataset:
    name: str
    vcf_path: str
    reference_name: str
    min_position: int
    max_position: int

    @classmethod
    def synthetic(cls, workdir: str, samples: int = 500, variants: int = 5000) -> "Dataset":
        from .random_vcf import generate_vcf

        path = os.path.join(workdir, f"synthetic-{samples}-{variants}.vcf")
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(generate_vcf(samples, variants, seed=5))
        return cls(
            name=f"synthetic-{samples}-{variants}",
            vcf_path=path,
            reference_name="1",
            min_position=10_000,
            max_position=10_000 + 2 * variants,
        )

    # 1000 Genomes coordinates used by the reference harness
    # (evaluation_main.py:36-64)
    @classmethod
    def thousand_genomes_chr22(cls, vcf_path: str) -> "Dataset":
        return cls("1000g-chr22", vcf_path, "22", 16_050_075, 51_244_237)

    @classmethod
    def thousand_genomes_chr1(cls, vcf_path: str) -> "Dataset":
        return cls("1000g-chr1", vcf_path, "1", 10_177, 249_240_543)


@dataclass
class HarnessConfig:
    workdir: str = "eval-work"
    output_dir: str = "eval-out"
    test_runs: int = 5
    default_bin_size: int = 150
    n_positions: int = 200  # query positions sampled per sweep
    range_size: int = 5_000  # bp per range query
    flush_page_cache: bool = False  # cold-cache timing (needs privileges)
    bin_sizes_profile: tuple[int, ...] = (5, 10, 20, 50, 100, 150, 300, 500, 1000)
    bin_sizes_creation: tuple[int, ...] = (5, 10, 20, 50, 100, 150, 300, 500, 1000, 2000)
    schemes: tuple[str, ...] = (
        "vcfc-binned",
        "vcfc-binned-native",
        "vcfc-manifest-native",
        "vcfc-sparse",
        "vcfc-sparse-external",
        "vcfz-v3",
        "vcfz-v4",
        "vcfz-v5",
        "vcfz-v6",
        "vcfz-v7",
        "vcfz-v8",
        "tabix-bgzip",
        "tabix-bcf",
    )


def flush_page_cache() -> bool:
    """Best-effort page-cache drop for cold-cache runs (the reference uses
    passwordless sudo, command.py:12-18)."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (PermissionError, FileNotFoundError, OSError):
        return False
