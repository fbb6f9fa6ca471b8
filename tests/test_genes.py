"""Gene-region benchmark parity (reference: evaluation/query.py)."""

import json
import os

import pytest

from test_fuzz import make_vcf

from vcfc_tpu.eval import genes
from vcfc_tpu.host import native


def test_coordinates_cache_roundtrip(tmp_path, monkeypatch):
    db = str(tmp_path / "genes.db")
    monkeypatch.setattr(genes, "_fetch_ensembl", lambda s: None)
    c = genes.get_gene_coordinates("TP53", db)
    assert c["reference_name"] == "17" and c["start"] < c["end"]
    # second lookup is served from sqlite even if the table vanished
    monkeypatch.setattr(genes, "GRCH37_GENES", {})
    c2 = genes.get_gene_coordinates("TP53", db)
    assert c2 == c


def test_unknown_symbol_raises(tmp_path, monkeypatch):
    monkeypatch.setattr(genes, "_fetch_ensembl", lambda s: None)
    with pytest.raises(KeyError):
        genes.get_gene_coordinates("NOTAGENE", str(tmp_path / "g.db"))


def test_vendored_list_matches_reference():
    # the reference benchmarks exactly these 13 symbols (query.py:145-161)
    assert set(genes.GRCH37_GENES) == {
        "TP53", "ALDH2", "BRCA1", "BRCA2", "TNF", "EGFR", "VEGFA",
        "APOE", "IL6", "TGFB1", "MTHFR", "ESR1", "AKT1",
    }


@pytest.mark.skipif(not native.available(), reason="needs native CLI")
def test_benchmark_runs_on_synthetic(tmp_path):
    vcf = make_vcf(801, 40, 200)
    vcf_path = tmp_path / "g.vcf"
    vcf_path.write_bytes(vcf)
    out = genes.benchmark(
        str(vcf_path),
        [{"gene_name": "GX", "reference_name": "1", "start": 1000, "end": 4000}],
        workdir=str(tmp_path / "wd"),
        iterations=1,
    )
    row = out["genes"]["GX"]
    assert row["region"] == "1:1000-4000"
    assert row["vcfc-binned-native"] > 0
    assert row["vcfc-manifest-native"] > 0
    assert json.dumps(out)  # serializable
