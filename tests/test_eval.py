"""Eval harness: all six operations produce JSON; graphs render."""

import json

import pytest

from vcfc_tpu.eval.config import Dataset, HarnessConfig
from vcfc_tpu.eval.graphs import GRAPHERS
from vcfc_tpu.eval.harness import OPERATIONS, Harness


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    work = tmp_path_factory.mktemp("evalw")
    out = tmp_path_factory.mktemp("evalo")
    config = HarnessConfig(
        workdir=str(work),
        output_dir=str(out),
        test_runs=1,
        n_positions=6,
        bin_sizes_profile=(10, 50),
        bin_sizes_creation=(10, 50),
        schemes=("vcfc-binned", "vcfc-sparse-external"),
    )
    dataset = Dataset.synthetic(str(work), samples=20, variants=200)
    return Harness(dataset, config)


@pytest.mark.parametrize("op", sorted(OPERATIONS))
def test_operation_and_graph(harness, op):
    path = OPERATIONS[op](harness)
    with open(path) as f:
        data = json.load(f)
    assert data["dataset"] == harness.dataset.name
    png = GRAPHERS[op](path)
    assert png.endswith(".png")


def test_single_query_results_nonempty(harness):
    scheme = harness.factory.vcfc_binned(10)
    # positions are even: an even in-range position must return a line
    out = scheme.query_single_fn("1", 10_100)
    assert out.startswith(b"1\t10100\t")


def test_gene_panel_queries():
    from test_fuzz import make_vcf
    from vcfc_tpu.eval.genes import measure_gene_queries
    from vcfc_tpu.format import compress_bytes
    from vcfc_tpu.index.binned import build_binned_index
    from vcfc_tpu.utils.config import BinnedIndexConfig

    vcf = make_vcf(801, 40, 60)
    vcfc = compress_bytes(vcf)
    vcfci = build_binned_index(vcfc, BinnedIndexConfig(10))
    res = measure_gene_queries(
        vcfc, vcfci, genes={"FAKE": ("1", 1000, 9000)}, iterations=2
    )
    assert "FAKE" in res and res["FAKE"]["result_bytes"] > 0
    assert res["FAKE"]["p50_s"] >= 0
