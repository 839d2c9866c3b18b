#!/usr/bin/env python
"""Multi-seed experiment orchestration.

Python port of the reference bash protocol (``/root/reference/scripts/
test.bash``, ``dualcamnet.bash``): run a config over N seeds, read each
run's best epoch from ``model.txt`` (``scripts/test.bash:12-14``), evaluate
the best checkpoint, then report the 5-seed trimmed mean +- std
(``meanstd.py``). The per-threshold IoU sweep that the bash scripts ran 11
times is a single ``tools iou`` invocation here.

Usage:
    python scripts/sweep.py --seeds 5 --checkpoint_dir ckpt \
        --exp_name acres -- --embedding 1 --mfcc 1 \
        --train_file ... --valid_file ... --test_file ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_test_accuracy(text: str) -> dict:
    """Parse a ``test_accuracy*.txt`` line ("ts: exp - k: v - k: v ...",
    ``mfcctrainer.py:527-534`` format) into {metric: float}."""
    results: dict = {}
    for part in text.split(" - "):
        if ":" in part:
            k, _, v = part.rpartition(":")
            try:
                results[k.strip().split()[-1]] = float(v)
            except ValueError:
                pass
    return results


def default_disk_store(flags: list[str], checkpoint_dir: str) -> list[str]:
    """The N-seed sweep is exactly the cross-run scenario the disk feature
    tier exists for (docs/PERF.md "Cross-run disk tier"): every seed shares
    the same frozen trunk + window table, so seeds 1..N-1 skip the trunk
    entirely. Default the store on next to the checkpoints unless the
    caller picked a location themselves (or isn't caching features)."""
    try:
        i = flags.index("--cache_trunk_features")
        caching = i + 1 < len(flags) and flags[i + 1] not in ("0", "false")
    except ValueError:
        caching = False
    if caching and "--cache_disk_dir" not in flags:
        return [*flags, "--cache_disk_dir",
                os.path.join(checkpoint_dir, "_feature_store")]
    return list(flags)


def run_seed(seed: int, args, train_flags: list[str]) -> dict:
    exp = f"{args.exp_name}_seed{seed}"
    base = [
        sys.executable, "-m", "acoustic_image_generation_tpu.cli.main",
        "--checkpoint_dir", args.checkpoint_dir, "--exp_name", exp,
        "--seed", str(seed), *train_flags,
    ]
    subprocess.run([*base, "--mode", "train"], check=True, cwd=REPO)

    from acoustic_image_generation_tpu.train.checkpoint import BestTracker

    run_dir = os.path.join(args.checkpoint_dir, exp)
    best = BestTracker.read_best_epoch(run_dir)
    ckpt = os.path.join(run_dir, f"epoch_{best}.ckpt")
    subprocess.run(
        [*base, "--mode", "test", "--restore_checkpoint", ckpt], check=True, cwd=REPO
    )
    results = {}
    test_file = os.path.join(run_dir, "test_accuracy.txt")
    if os.path.exists(test_file):
        with open(test_file) as f:
            results = parse_test_accuracy(f.read())
    results["best_epoch"] = best
    return results


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--exp_name", required=True)
    parser.add_argument("train_flags", nargs=argparse.REMAINDER)
    args = parser.parse_args()
    flags = default_disk_store(
        [f for f in args.train_flags if f != "--"], args.checkpoint_dir
    )

    sys.path.insert(0, REPO)
    from acoustic_image_generation_tpu.evaluation.aggregate import aggregate_runs

    per_seed: dict[str, list[float]] = {}
    for seed in range(args.seeds):
        results = run_seed(seed, args, flags)
        print(f"seed {seed}: {results}")
        for k, v in results.items():
            per_seed.setdefault(k, []).append(v)

    out = aggregate_runs(
        per_seed, os.path.join(args.checkpoint_dir, f"{args.exp_name}_aggregate.json")
    )
    print(json.dumps(out, indent=2, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
