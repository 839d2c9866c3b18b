"""kNN latent-space classification (``/root/reference/knn.py:17-60``):
15-NN with uniform votes over exported embeddings. Batched jnp distance +
top-k on device; tie-breaking follows sklearn's (lowest class index wins,
np.argmax on bincount)."""

from __future__ import annotations

import numpy as np


def knn_accuracy(
    train_x, train_y, test_x, test_y, k: int = 15, *, chunk: int = 2048
) -> float:
    """Accuracy of k-NN classification, matching sklearn
    ``KNeighborsClassifier(n_neighbors=k)`` with uniform weights.

    Distances are computed in ``chunk``-row blocks of the test set so the
    working set stays at chunk x N_train instead of the full N x N matrix
    (the real ACIVW splits are ~17k clips)."""
    train_x = np.reshape(np.asarray(train_x), (len(train_x), -1)).astype(np.float32)
    test_x = np.reshape(np.asarray(test_x), (len(test_x), -1)).astype(np.float32)
    train_y = np.asarray(train_y)
    test_y = np.asarray(test_y)

    train_sq = np.sum(train_x**2, 1)[None, :]
    num_classes = int(max(train_y.max(), test_y.max())) + 1
    correct = 0
    for lo in range(0, len(test_x), chunk):
        tx = test_x[lo:lo + chunk]
        d = np.sum(tx**2, 1)[:, None] - 2.0 * tx @ train_x.T + train_sq
        nn_idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        votes = train_y[nn_idx]  # (chunk, k)
        counts = np.apply_along_axis(np.bincount, 1, votes, minlength=num_classes)
        pred = np.argmax(counts, axis=1)
        correct += int(np.sum(pred == test_y[lo:lo + chunk]))
    return correct / max(len(test_y), 1)
