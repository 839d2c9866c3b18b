"""Cross-modal retrieval: rank-1/2/5/10/30 + per-class rank-1 confusion
(``/root/reference/retrieve.py:53-120``): for each anchor embedding, sort
the other modality's gallery by euclidean distance and check whether a
same-class item appears in the top-k."""

from __future__ import annotations

import numpy as np

from acoustic_image_generation_tpu.evaluation.distance import (
    as_feature_matrix,
    iter_sq_distance_blocks,
)

RANKS = (1, 2, 5, 10, 30)


def retrieval_ranks(
    anchors: np.ndarray,
    anchor_labels: np.ndarray,
    gallery: np.ndarray,
    gallery_labels: np.ndarray,
    num_classes: int,
    *,
    chunk: int = 2048,
) -> dict:
    anchors = as_feature_matrix(anchors)
    gallery = as_feature_matrix(gallery)
    anchor_labels = np.asarray(anchor_labels)
    gallery_labels = np.asarray(gallery_labels)

    # only the top max(RANKS) gallery labels matter per anchor; chunked
    # over anchors so the working set stays chunk x N_gallery
    top = max(RANKS)
    hits = {k: 0 for k in RANKS}
    confusion1 = np.zeros((num_classes, num_classes), dtype=float)
    for lo, d in iter_sq_distance_blocks(anchors, gallery, chunk):
        order = np.argsort(d, axis=1, kind="stable")[:, :top]
        for a in range(len(order)):
            ranked = gallery_labels[order[a]]
            confusion1[anchor_labels[lo + a], ranked[0]] += 1
            for k in RANKS:
                if anchor_labels[lo + a] in ranked[:k]:
                    hits[k] += 1
    n = max(len(anchors), 1)
    out = {f"rank{k}": hits[k] / n for k in RANKS}
    out["confusion_rank1"] = confusion1
    return out
