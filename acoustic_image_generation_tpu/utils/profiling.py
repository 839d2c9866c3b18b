"""Profiling / throughput observability (SURVEY.md §5).

The reference has none beyond ``datetime.now()`` prints
(``/root/reference/trainer/trainer.py:274-275``). Here:
- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-viewable / xprof traces of the jitted step;
- ``StepTimer``: host-side steps/sec + clips/sec/chip counters with a
  warmup skip, used by bench.py and available to the Trainer loop;
- ``device_memory_stats()``: live per-device HBM numbers where the backend
  exposes them.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Track steps/sec and clips/sec over a sliding window, skipping the
    first ``warmup`` steps (compile)."""

    def __init__(self, clips_per_step: float, warmup: int = 2):
        self.clips_per_step = clips_per_step
        self.warmup = warmup
        self.count = 0
        self._t0 = None
        self.steps_timed = 0

    def step(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()
        elif self.count > self.warmup:
            self.steps_timed = self.count - self.warmup

    @property
    def seconds(self) -> float:
        if self._t0 is None:
            return 0.0
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        s = self.seconds
        return self.steps_timed / s if s > 0 else 0.0

    @property
    def clips_per_sec(self) -> float:
        return self.steps_per_sec * self.clips_per_step


def op_stats(logdir: str, steps: int = 1, top: int = 20) -> dict:
    """Aggregate a ``trace(logdir)`` capture into per-step op statistics.

    Parses the TraceViewer JSON the profiler writes (no
    tensorboard_plugin_profile dependency) and returns, normalized per
    ``steps``:

    - ``total_ms``: device-lane busy time per step,
    - ``by_category``: rows ``(category, ms, pct, gb_accessed, gbps)``
      keyed by XLA's ``hlo_category`` (convolution fusion, loop fusion,
      data formatting, ...), sorted by time,
    - ``top_ops``: the ``top`` most expensive individual HLO ops with
      their fused long names — the table to read before optimizing a
      step (docs/PERF.md shows the flagship's).

    Works for TPU and CPU captures; picks the busiest non-host device
    lane ("XLA Ops" thread) in the trace.
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = sorted(
        glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    host_pids = set()
    op_lanes = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "host" in e["args"]["name"]:
            host_pids.add(e["pid"])
        if e.get("name") == "thread_name" and e["args"]["name"] == "XLA Ops":
            op_lanes[(e["pid"], e["tid"])] = 0.0
    for e in events:
        k = (e.get("pid"), e.get("tid"))
        if e.get("ph") == "X" and k in op_lanes:
            op_lanes[k] += e["dur"]
    if not op_lanes:
        raise ValueError("no XLA Ops lane found in trace")
    # prefer accelerator lanes; the CPU backend parents its op lane under
    # the host process, so fall back to host lanes when that's all there is
    device_lanes = {k: v for k, v in op_lanes.items() if k[0] not in host_pids}
    pid, tid = max(device_lanes or op_lanes, key=(device_lanes or op_lanes).get)
    ops = [
        e
        for e in events
        if e.get("pid") == pid and e.get("tid") == tid and e.get("ph") == "X"
    ]

    cat = collections.defaultdict(lambda: [0.0, 0.0])
    per_op = collections.defaultdict(lambda: [0.0, 0.0, ""])
    for e in ops:
        a = e.get("args", {})
        ms = e["dur"] / 1e3 / steps
        gb = float(a.get("bytes_accessed", 0)) / 1e9 / steps
        c = a.get("hlo_category", "other")
        cat[c][0] += ms
        cat[c][1] += gb
        o = per_op[e["name"]]
        o[0] += ms
        o[1] += gb
        o[2] = a.get("long_name", e["name"])
    total_ms = sum(v[0] for v in cat.values())
    by_category = [
        {
            "category": k,
            "ms": round(v[0], 3),
            "pct": round(100 * v[0] / total_ms, 1) if total_ms else 0.0,
            "gb_accessed": round(v[1], 3),
            "gbps": round(v[1] / (v[0] / 1e3), 1) if v[0] else 0.0,
        }
        for k, v in sorted(cat.items(), key=lambda kv: -kv[1][0])
    ]
    top_ops = [
        {
            "op": k,
            "ms": round(v[0], 3),
            "gb_accessed": round(v[1], 3),
            "long_name": v[2][:200],
        }
        for k, v in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]
    ]
    return {"total_ms": round(total_ms, 3), "by_category": by_category, "top_ops": top_ops}


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out.append({"device": str(d), **{k: int(v) for k, v in stats.items()}})
    return out
