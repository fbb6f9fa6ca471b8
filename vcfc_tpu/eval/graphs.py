"""Render matplotlib PNGs from harness JSON outputs (the reference's
`graph` mode, evaluation_main.py:116-154, 642-740)."""

from __future__ import annotations

import json
import os


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _png_path(json_path: str) -> str:
    base, ext = os.path.splitext(json_path)
    return base + ".png"  # never clobbers the input even without .json


def graph_exhaustive(json_path: str, out_path: str | None = None) -> str:
    plt = _mpl()
    with open(json_path) as f:
        data = json.load(f)
    fig, ax = plt.subplots(figsize=(10, 5))
    for name, entry in data["schemes"].items():
        if "skipped" in entry:
            continue
        qs = entry["queries"]
        ax.plot(
            [q["pos"] for q in qs],
            [q["mean_s"] * 1e3 for q in qs],
            marker=".",
            linestyle="none",
            markersize=3,
            label=name,
        )
    ax.set_xlabel("position")
    ax.set_ylabel("latency (ms)")
    ax.set_title(f"{data['dataset']} {data['kind']}-variant query latency")
    ax.legend()
    out_path = out_path or _png_path(json_path)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def graph_timing_profile(json_path: str, out_path: str | None = None) -> str:
    plt = _mpl()
    with open(json_path) as f:
        data = json.load(f)
    bins = sorted(data["bins"], key=int)
    labels: list[str] = sorted(
        {l for b in bins for l in data["bins"][b]["phases_ns"]}
    )
    fig, ax = plt.subplots(figsize=(10, 5))
    bottom = [0.0] * len(bins)
    for label in labels:
        vals = [
            data["bins"][b]["phases_ns"].get(label, 0)
            / max(data["bins"][b]["queries"], 1)
            / 1e6
            for b in bins
        ]
        ax.bar(range(len(bins)), vals, bottom=bottom, label=label)
        bottom = [b + v for b, v in zip(bottom, vals)]
    ax.set_xticks(range(len(bins)), bins)
    ax.set_xlabel("bin size")
    ax.set_ylabel("ms per query (stacked phases)")
    ax.set_title(f"{data['dataset']} binned-index {data['kind']} phase profile")
    ax.legend()
    out_path = out_path or _png_path(json_path)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def graph_index_creation(json_path: str, out_path: str | None = None) -> str:
    plt = _mpl()
    with open(json_path) as f:
        data = json.load(f)
    fig, ax = plt.subplots(figsize=(8, 5))
    if "bins" in data:
        bins = sorted(data["bins"], key=int)
        ax.plot([int(b) for b in bins], [data["bins"][b]["mean_s"] for b in bins], marker="o")
        ax.set_xlabel("bin size")
        ax.set_xscale("log")
    else:
        names = [n for n, e in data["schemes"].items() if "skipped" not in e]
        ax.bar(names, [data["schemes"][n]["mean_s"] for n in names])
        ax.tick_params(axis="x", rotation=30)
    ax.set_ylabel("creation time (s)")
    ax.set_title(f"{data['dataset']} index creation time")
    out_path = out_path or _png_path(json_path)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


GRAPHERS = {
    "all-exhaustive-single": graph_exhaustive,
    "all-exhaustive-range": graph_exhaustive,
    "binned-timing-profile-single": graph_timing_profile,
    "binned-timing-profile-range": graph_timing_profile,
    "binned-index-creation-time": graph_index_creation,
    "all-indexing-times": graph_index_creation,
}
