"""Principal component analysis on the randomized/tall SVD paths.

The reference's raison d'etre is exactly this workload class — "PCA on a
matrix that does not fit on one machine" is the numpywren paper's opening
example — but upstream stops at the factorization primitives. This closes
the loop: center on host (one pass), sketch/project on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["pca"]


def pca(x, n_components: int, center: bool = True,
        method: str = "auto", seed: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top `n_components` principal components of the (n_samples, n_features)
    data matrix x.

    Returns (components, explained_variance, scores):
    components (n_components, n_features) — rows are principal axes;
    explained_variance (n_components,) — sigma^2 / (n_samples - 1);
    scores (n_samples, n_components) — the data projected onto the axes.

    method: "auto" picks "tall" (exact thin SVD via CholeskyQR, models.svd_tall)
    when the feature count is small enough that the thin SVD IS the truncated
    one, else "randomized" (models.randomized_svd — GEMM-speed sketching)."""
    from numpywren_tpu.models.svd import randomized_svd, svd_tall

    x = np.asarray(x)
    if x.ndim != 2:
        raise ValueError(f"pca expects 2-D data, got shape {x.shape}")
    m, n = x.shape
    if not 1 <= n_components <= min(m, n):
        raise ValueError(f"n_components {n_components} out of range for {x.shape}")
    if center:
        x = x - x.mean(axis=0, keepdims=True, dtype=np.float64).astype(x.dtype)
    if method == "auto":
        method = "tall" if (n <= 2048 and m >= n) else "randomized"
    if method == "tall":
        u, s, vt = svd_tall(x)
        u, s, vt = u[:, :n_components], s[:n_components], vt[:n_components]
    elif method == "randomized":
        u, s, vt = randomized_svd(x, rank=n_components, seed=seed)
    else:
        raise ValueError(f"unknown method {method!r}")
    explained = (s.astype(np.float64) ** 2 / max(m - 1, 1)).astype(x.dtype)
    scores = u * s
    return vt, explained, scores
