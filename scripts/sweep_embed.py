"""5-seed embedding sweep + trimmed aggregation on the real TPU.

Reproduces the reference's reporting protocol end to end: every config
runs 5x (``/root/reference/scripts/test.bash:5`` seed loop), metrics are
aggregated with one min and one max dropped, and the artifact is an
.xlsx workbook (``meanstd.py:7-33, 150-163``) — here produced by the
framework's own ``evaluation.aggregate`` + ``utils.xlsx``.

Each seed runs in a fresh subprocess: the dev TPU tunnel can wedge on
hour-scale processes, and a fresh client per seed also matches how the
reference's bash loop isolates runs.
"""
import json
import os
import subprocess
import sys

SEEDS = [int(s) for s in os.environ.get("AIG_SWEEP_SEEDS", "0,1,2,3,4").split(",")]
OUT_DIR = os.environ.get("AIG_SWEEP_DIR", "/tmp/aig_embed_sweep")
os.makedirs(OUT_DIR, exist_ok=True)

here = os.path.dirname(os.path.abspath(__file__))
runs = []
for seed in SEEDS:
    out = os.path.join(OUT_DIR, f"seed_{seed}.json")
    if not os.path.exists(out):
        env = dict(os.environ, AIG_EMBED_SEED=str(seed), AIG_EMBED_OUT=out)
        print(f"--- seed {seed}", flush=True)
        subprocess.run(
            [sys.executable, "-u", os.path.join(here, "study_embed.py")],
            env=env, check=True, timeout=3600,
        )
    with open(out) as f:
        runs.append(json.load(f))

from acoustic_image_generation_tpu.evaluation.aggregate import aggregate_runs

metrics: dict[str, list[float]] = {}
for r in runs:
    for mod, v in r["knn15"].items():
        metrics.setdefault(f"knn15/{mod}", []).append(v)
    for pair, v in r["retrieval_rank1"].items():
        metrics.setdefault(f"rank1/{pair}", []).append(v)

agg_json = aggregate_runs(metrics, os.path.join(OUT_DIR, "meanstd.json"))
aggregate_runs(metrics, os.path.join(OUT_DIR, "meanstd.xlsx"))
print(json.dumps(agg_json, indent=1, sort_keys=True), flush=True)
print(f"artifacts: {OUT_DIR}/meanstd.json, {OUT_DIR}/meanstd.xlsx", flush=True)
