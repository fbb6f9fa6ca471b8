"""The six benchmark operations.

Mirrors the reference harness's operation set (evaluation_main.py:759-769):

  all-exhaustive-single          single-variant latency across schemes
  all-exhaustive-range           range-query latency across schemes
  binned-timing-profile-single   per-phase profile vs bin size (single)
  binned-timing-profile-range    per-phase profile vs bin size (range)
  binned-index-creation-time     .vcfci creation time vs bin size
  all-indexing-times             index creation across schemes

``measure`` writes JSON into the output dir; ``graph`` renders matplotlib
PNGs from those JSONs (see graphs.py).  Phase profiles keep the
reference's TIMING label taxonomy (index_search / decompress_seeking /
decompress_iteration; command.py:135-158) via vcfc_tpu.utils.timing.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np

from ..index.binned import build_binned_index
from ..utils import timing
from ..utils.config import BinnedIndexConfig
from .config import Dataset, HarnessConfig, flush_page_cache
from .schemes import SchemeFactory


def _positions(dataset: Dataset, n: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    return rng.integers(dataset.min_position, dataset.max_position, size=n).tolist()


def _timed(fn, runs: int, flush: bool):
    times = []
    result = None
    for _ in range(runs):
        if flush:
            flush_page_cache()
        t0 = time.perf_counter()
        result = fn()
        times.append(time.perf_counter() - t0)
    return times, result


def _summary(times: list[float]) -> dict:
    s = sorted(times)
    # nearest-rank p99 (== max below 100 samples; meaningful for the
    # across-positions aggregate — BASELINE.md names p50/p99 as a gate)
    p99 = s[min(len(s) - 1, max(0, -(-99 * len(s) // 100) - 1))]
    return {
        "mean_s": statistics.fmean(times),
        "min_s": min(times),
        "max_s": max(times),
        "p50_s": statistics.median(times),
        "p99_s": p99,
        "runs": len(times),
    }


class Harness:
    def __init__(self, dataset: Dataset, config: HarnessConfig):
        self.dataset = dataset
        self.config = config
        os.makedirs(config.output_dir, exist_ok=True)
        self.factory = SchemeFactory(dataset, config.workdir, config.default_bin_size)

    def _write(self, op: str, payload: dict) -> str:
        path = os.path.join(
            self.config.output_dir, f"{op}-{self.dataset.name}.json"
        )
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        return path

    def _sweep(self, kind: str) -> dict:
        cfg = self.config
        positions = _positions(self.dataset, cfg.n_positions)
        results: dict = {
            "dataset": self.dataset.name,
            "kind": kind,
            "positions": len(positions),
            # warm vs cold page cache is a protocol difference, not noise
            # (the reference flushes before every run, command.py:12-18);
            # recorded so artifacts are self-describing
            "cache_mode": "cold" if cfg.flush_page_cache else "warm",
            "schemes": {},
        }
        for name in cfg.schemes:
            scheme = self.factory.build(name)
            if scheme is None:
                results["schemes"][name] = {"skipped": "tool not available"}
                continue
            per_query = []
            for pos in positions:
                if kind == "single":
                    fn = lambda: scheme.query_single_fn(self.dataset.reference_name, pos)
                else:
                    fn = lambda: scheme.query_range_fn(
                        self.dataset.reference_name, pos, pos + cfg.range_size
                    )
                times, out = _timed(fn, cfg.test_runs, cfg.flush_page_cache)
                per_query.append(
                    {"pos": pos, **_summary(times), "result_bytes": len(out or b"")}
                )
            all_means = [q["mean_s"] for q in per_query]
            results["schemes"][scheme.name] = {
                "backend": scheme.backend,
                "queries": per_query,
                "overall": _summary(all_means),
            }
        return results

    # -- the six operations ----------------------------------------------

    def all_exhaustive_single(self) -> str:
        return self._write("all-exhaustive-single", self._sweep("single"))

    def all_exhaustive_range(self) -> str:
        return self._write("all-exhaustive-range", self._sweep("range"))

    def _binned_profile(self, kind: str) -> dict:
        cfg = self.config
        positions = _positions(self.dataset, max(cfg.n_positions // 4, 10))
        was_enabled = timing.enabled()
        out: dict = {"dataset": self.dataset.name, "kind": kind, "bins": {}}
        try:
            for bin_size in cfg.bin_sizes_profile:
                scheme = self.factory.vcfc_binned(bin_size)
                # accumulate via totals() only: echoing TIMING lines would
                # pollute stdout and inflate enclosing phase timings
                timing.enable(True, echo=False)
                phases: dict[str, int] = {}
                t0 = time.perf_counter()
                for pos in positions:
                    timing.reset()
                    if kind == "single":
                        scheme.query_single_fn(self.dataset.reference_name, pos)
                    else:
                        scheme.query_range_fn(
                            self.dataset.reference_name, pos, pos + cfg.range_size
                        )
                    for label, ns in timing.totals().items():
                        phases[label] = phases.get(label, 0) + ns
                wall = time.perf_counter() - t0
                timing.enable(False)
                out["bins"][bin_size] = {
                    "phases_ns": phases,
                    "wall_s": wall,
                    "queries": len(positions),
                }
        finally:
            timing.enable(was_enabled, echo=True)
        return out

    def binned_timing_profile_single(self) -> str:
        return self._write(
            "binned-timing-profile-single", self._binned_profile("single")
        )

    def binned_timing_profile_range(self) -> str:
        return self._write("binned-timing-profile-range", self._binned_profile("range"))

    def binned_index_creation_time(self) -> str:
        cfg = self.config
        out: dict = {"dataset": self.dataset.name, "bins": {}}
        for bin_size in cfg.bin_sizes_creation:
            times, index = _timed(
                lambda: build_binned_index(
                    self.factory.vcfc, BinnedIndexConfig(bin_size)
                ),
                cfg.test_runs,
                cfg.flush_page_cache,
            )
            out["bins"][bin_size] = {**_summary(times), "index_bytes": len(index)}
        return self._write("binned-index-creation-time", out)

    def all_indexing_times(self) -> str:
        cfg = self.config
        out: dict = {
            "dataset": self.dataset.name,
            "cache_mode": "cold" if cfg.flush_page_cache else "warm",
            "schemes": {},
        }
        for name in cfg.schemes:
            def build():
                # force_rebuild: cached artifacts would make runs 2..N no-ops
                return self.factory.build(name, force_rebuild=True)

            times, scheme = _timed(build, cfg.test_runs, cfg.flush_page_cache)
            if scheme is None:
                out["schemes"][name] = {"skipped": "tool not available"}
                continue
            size = (
                os.path.getsize(scheme.index_path)
                if scheme.index_path and os.path.exists(scheme.index_path)
                else None
            )
            out["schemes"][name] = {
                "backend": scheme.backend,
                **_summary(times),
                "index_bytes": size,
            }
        return self._write("all-indexing-times", out)


OPERATIONS = {
    "all-exhaustive-single": Harness.all_exhaustive_single,
    "all-exhaustive-range": Harness.all_exhaustive_range,
    "binned-timing-profile-single": Harness.binned_timing_profile_single,
    "binned-timing-profile-range": Harness.binned_timing_profile_range,
    "binned-index-creation-time": Harness.binned_index_creation_time,
    "all-indexing-times": Harness.all_indexing_times,
}
