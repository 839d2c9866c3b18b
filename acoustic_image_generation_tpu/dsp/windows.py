"""Window functions (NumPy, precomputed constants).

The reference windows each 1024-sample audio frame with a Tukey window of
alpha=0.75 (``/root/reference/dataloader/outdoor_data_mfcc.py:799``,
``scipy.signal.tukey(1024, alpha=0.75)``). We reimplement the symmetric
Tukey window directly so the runtime has no SciPy dependency; a golden test
checks bit-parity against SciPy.
"""

from __future__ import annotations

import numpy as np


def tukey(m: int, alpha: float = 0.5) -> np.ndarray:
    """Symmetric Tukey (tapered cosine) window of length ``m``.

    Matches ``scipy.signal.windows.tukey(m, alpha, sym=True)``.
    """
    if m == 1:
        return np.ones(1)
    if alpha <= 0:
        return np.ones(m)
    if alpha >= 1.0:
        alpha = 1.0

    n = np.arange(0, m)
    width = int(np.floor(alpha * (m - 1) / 2.0))
    n1 = n[0 : width + 1]
    n2 = n[width + 1 : m - width - 1]
    n3 = n[m - width - 1 :]

    w1 = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * n1 / alpha / (m - 1))))
    w2 = np.ones(n2.shape[0])
    w3 = 0.5 * (1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * n3 / alpha / (m - 1))))

    return np.concatenate((w1, w2, w3))
