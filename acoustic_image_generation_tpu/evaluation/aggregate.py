"""Multi-seed aggregation: drop min & max, mean +- std
(``/root/reference/meanstd.py:7-33``) — the reference's 5-seed reporting
protocol. Output is json or, matching the reference artifact
(``meanstd.py:150-163``), a real .xlsx workbook written by the
dependency-free ``utils.xlsx`` writer."""

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
    """{metric: [seed values]} -> {metric: {mean, std, n}}. ``out_path``
    ending in .xlsx writes the reference-style workbook
    (meanstd.py:150-163: one row per metric, mean/std/n columns);
    anything else writes json."""
    out = {}
    for name, vals in metric_values.items():
        mean, std = trimmed_mean_std(vals)
        out[name] = {"mean": mean, "std": std, "n": len(vals)}
    if out_path and out_path.endswith(".xlsx"):
        from acoustic_image_generation_tpu.utils.xlsx import write_xlsx

        rows = [["metric", "mean", "std", "n"]] + [
            [name, v["mean"], v["std"], v["n"]] for name, v in sorted(out.items())
        ]
        write_xlsx(out_path, rows, sheet_name="meanstd")
    elif out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
    return out
