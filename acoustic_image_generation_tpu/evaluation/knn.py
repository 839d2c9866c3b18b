"""kNN latent-space classification (``/root/reference/knn.py:17-60``):
15-NN with uniform votes over exported embeddings. Chunked distance +
top-k; tie-breaking follows sklearn's (lowest class index wins,
np.argmax on bincount)."""

from __future__ import annotations

import numpy as np

from acoustic_image_generation_tpu.evaluation.distance import (
    as_feature_matrix,
    iter_sq_distance_blocks,
)


def knn_accuracy(
    train_x, train_y, test_x, test_y, k: int = 15, *, chunk: int = 2048
) -> float:
    """Accuracy of k-NN classification, matching sklearn
    ``KNeighborsClassifier(n_neighbors=k)`` with uniform weights.

    Distances are computed in ``chunk``-row blocks of the test set so the
    working set stays at chunk x N_train instead of the full N x N matrix
    (the real ACIVW splits are ~17k clips)."""
    if len(test_y) == 0:
        return 0.0
    train_x = as_feature_matrix(train_x)
    test_x = as_feature_matrix(test_x)
    train_y = np.asarray(train_y)
    test_y = np.asarray(test_y)

    num_classes = int(max(train_y.max(), test_y.max())) + 1
    correct = 0
    for lo, d in iter_sq_distance_blocks(test_x, train_x, chunk):
        nn_idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        votes = train_y[nn_idx]  # (chunk, k)
        counts = np.apply_along_axis(np.bincount, 1, votes, minlength=num_classes)
        pred = np.argmax(counts, axis=1)
        correct += int(np.sum(pred == test_y[lo:lo + len(pred)]))
    return correct / len(test_y)
