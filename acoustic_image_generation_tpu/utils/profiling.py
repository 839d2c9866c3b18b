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


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out.append({"device": str(d), **{k: int(v) for k, v in stats.items()}})
    return out
