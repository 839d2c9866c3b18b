"""Multi-seed aggregation: drop min & max, mean +- std
(``/root/reference/meanstd.py:7-33``) — the reference's 5-seed reporting
protocol. Output goes to json instead of xlsx (no pandas/openpyxl
dependency); the numbers are identical."""

from __future__ import annotations

import json
import numpy as np


def trimmed_mean_std(values) -> tuple[float, float]:
    """Drop one min and one max, return (mean, std) of the rest
    (population std, like np.std default used by the reference)."""
    v = sorted(float(x) for x in values)
    if len(v) > 2:
        v = v[1:-1]
    arr = np.asarray(v)
    return float(arr.mean()), float(arr.std())


def aggregate_runs(metric_values: dict[str, list[float]], out_path: str | None = None) -> dict:
    """{metric: [seed values]} -> {metric: {mean, std, n}} (+ optional json
    artifact mirroring meanstd.py's xlsx)."""
    out = {}
    for name, vals in metric_values.items():
        mean, std = trimmed_mean_std(vals)
        out[name] = {"mean": mean, "std": std, "n": len(vals)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
    return out
