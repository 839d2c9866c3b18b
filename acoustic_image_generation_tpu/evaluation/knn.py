"""kNN latent-space classification (``/root/reference/knn.py:17-60``):
15-NN with uniform votes over exported embeddings. Batched jnp distance +
top-k on device; tie-breaking follows sklearn's (lowest class index wins,
np.argmax on bincount)."""

from __future__ import annotations

import numpy as np


def knn_accuracy(train_x, train_y, test_x, test_y, k: int = 15) -> float:
    """Accuracy of k-NN classification, matching sklearn
    ``KNeighborsClassifier(n_neighbors=k)`` with uniform weights."""
    train_x = np.reshape(np.asarray(train_x), (len(train_x), -1)).astype(np.float32)
    test_x = np.reshape(np.asarray(test_x), (len(test_x), -1)).astype(np.float32)
    train_y = np.asarray(train_y)
    test_y = np.asarray(test_y)

    d = (
        np.sum(test_x**2, 1)[:, None]
        - 2.0 * test_x @ train_x.T
        + np.sum(train_x**2, 1)[None, :]
    )
    nn_idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    votes = train_y[nn_idx]  # (N, k)
    num_classes = int(max(train_y.max(), test_y.max())) + 1
    counts = np.apply_along_axis(np.bincount, 1, votes, minlength=num_classes)
    pred = np.argmax(counts, axis=1)
    return float(np.mean(pred == test_y))
