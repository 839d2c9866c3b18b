"""Frozen-trunk feature cache: compute the ResNet trunk once per window.

The reference trains the AAAI'21 generator against a *frozen* ResNet50
backbone — its ``var_list`` is the UNet plus conv_map/logits only
(``/root/reference/models/vision.py:68-71``,
``/root/reference/trainer/mfcctrainer.py:64``) — yet still pays a full
trunk forward every step. With ``trunk_bn="frozen"``
(core/config.ModelConfig) the trunk is a deterministic function of each
video frame, so its output at the stop_gradient boundary (block4, the
input to the trainable conv_map) can be computed once per window per
dataset and reused every epoch. This is the classic frozen-backbone
production optimization: steady-state training then runs at generator
speed instead of trunk speed (measured 254 ms -> ~70 ms per 64-clip step
on v5e; see docs/PERF.md).

The cache is host-side NumPy keyed by the loader's stable window index
(``RawBatch.window_ids``), bounded by ``max_bytes``; windows that do not
fit keep taking the full-trunk path, so the cache degrades gracefully to
round-1 behavior. Features are stored in bfloat16 (1.09 MB/frame at
14x19x2048) — half the f32 footprint, exactly the dtype the head
consumes on TPU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class TrunkFeatureCache:
    """Bounded host cache: window id -> (frames, 14, 19, 2048) bf16."""

    def __init__(self, max_bytes: int = 32 << 30) -> None:
        self.max_bytes = max_bytes
        self._store: dict[int, np.ndarray] = {}
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def __contains__(self, window_id: int) -> bool:
        return int(window_id) in self._store

    def get(self, window_id: int) -> np.ndarray | None:
        feat = self._store.get(int(window_id))
        if feat is None:
            self.misses += 1
        else:
            self.hits += 1
        return feat

    def put(self, window_id: int, feat: np.ndarray) -> bool:
        """Store one window's features; returns False (and stores nothing)
        once the byte budget is exhausted."""
        if int(window_id) in self._store:
            return True
        if self._bytes + feat.nbytes > self.max_bytes:
            return False
        self._store[int(window_id)] = feat
        self._bytes += feat.nbytes
        return True

    @property
    def nbytes(self) -> int:
        return self._bytes

    def __len__(self) -> int:
        return len(self._store)


def gather_batch(cache: TrunkFeatureCache, window_ids, valid: int):
    """Assemble a batch's cached features, or None if any valid window is
    missing. Returns (N*F, 14, 19, 2048) matching the flattened frame
    layout of ``Trainer._prepare``."""
    feats = []
    for i, wid in enumerate(window_ids):
        if i >= valid and feats:
            feats.append(feats[-1])  # padded rows repeat (masked in eval)
            continue
        f = cache.get(int(wid))
        if f is None:
            return None
        feats.append(f)
    return jnp.asarray(np.concatenate(feats, axis=0))
