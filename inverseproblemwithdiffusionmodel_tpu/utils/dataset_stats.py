"""Dataset statistics for hyperparameter selection.

Reference semantics: helpers/dataset_stats.py:19-60 — the Song & Ermon
"Techniques for training score-based models" heuristics: sigma_max should be
about the maximum pairwise distance in the training set; TV-norm histograms
pick the foreground threshold for 1-D tube filtering
(helpers/load_data.py:417-440).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def max_pairwise_distance(data: np.ndarray, max_samples: int = 1024,
                          seed: int = 0) -> float:
    """Max L2 distance between flattened samples — the sigma_max heuristic
    (reference: dataset_stats.py:19-39). Subsamples for O(n^2) feasibility;
    computed as one |x|^2 + |y|^2 - 2 x.y Gram matrix on device."""
    rng = np.random.RandomState(seed)
    n = data.shape[0]
    if n > max_samples:
        data = data[rng.choice(n, max_samples, replace=False)]
    x = jnp.asarray(data.reshape(data.shape[0], -1), jnp.float32)
    sq = jnp.sum(x ** 2, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * x @ x.T
    return float(jnp.sqrt(jnp.maximum(d2, 0.0).max()))


def tv_norm_histogram(signals: np.ndarray, bins: int = 50
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sample temporal TV norms + histogram for choosing the
    foreground/background threshold (reference: dataset_stats.py:42-60).
    signals: (N, T, C)."""
    x = np.asarray(signals)
    tv = np.abs(np.roll(x, -1, axis=1) - x).sum(axis=(1, 2)) / (
        x.shape[1] * x.shape[2])
    hist, edges = np.histogram(tv, bins=bins)
    return tv, (hist, edges)


def suggest_sigma_max(data: np.ndarray, **kw) -> float:
    """Alias with the paper's naming."""
    return max_pairwise_distance(data, **kw)
