"""Shared chunked squared-Euclidean distances for the latent-space evals.

Both ``knn.py`` and ``retrieve.py`` rank gallery items by squared
euclidean distance; at real-ACIVW scale (~17k clips) the full N x N
matrix is needlessly large, so blocks of ``chunk`` query rows are
streamed instead. Float32 + stable downstream argsort preserve the
sklearn/oracle tie-break parity the tests pin.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def as_feature_matrix(x) -> np.ndarray:
    return np.reshape(np.asarray(x), (len(x), -1)).astype(np.float32)


def iter_sq_distance_blocks(
    queries: np.ndarray, gallery: np.ndarray, chunk: int
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield ``(row_offset, d_block)`` with ``d_block[i, j]`` the squared
    distance from query ``row_offset + i`` to gallery item ``j``."""
    gal_sq = np.sum(gallery**2, 1)[None, :]
    for lo in range(0, len(queries), chunk):
        q = queries[lo:lo + chunk]
        yield lo, np.sum(q**2, 1)[:, None] - 2.0 * q @ gallery.T + gal_sq
