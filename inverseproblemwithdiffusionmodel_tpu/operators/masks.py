"""Cartesian variable-density undersampling mask generation.

Reference semantics: ncsn/linear_transforms/__init__.py:60-76
(`generate_mask`): exponential-decay line-sampling probability with a
guaranteed 2-line center block, then rejection filtering to keep only masks
whose mean acceleration is close to the ensemble mean.

Mask generation is host-side setup (numpy, explicitly seeded) - masks are
then device constants inside the jitted samplers.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def generate_mask(T: int, N: int, sw: float = 0.3, sm: float = 0.7,
                  sa: float = 0.045, T_max: int = 1000, dev: float = 0.01,
                  seed: Optional[int] = None) -> np.ndarray:
    """Variable-density Cartesian line masks.

    Returns (1, N) float32 if T == 1 else (T, 1, N): one mask of N
    phase-encode lines per frame. Presets (reference:
    undersampling_fourier.py:63-75):
      R = 8:  sw=0.196,   sm=0.5,  sa=0.02
      R = 16: sw=0.07926, sm=0.42, sa=0.02
      R = 20: sw=0.07,    sm=0.3,  sa=0.01782
    """
    rng = np.random.RandomState(seed)
    x = np.linspace(-1, 1, N)
    p = np.exp(-np.abs(x) / sw) * sm + sa
    masks = rng.rand(N, T_max) <= p[:, None]
    masks[N // 2 - 1:N // 2 + 1, :] = True  # always keep the 2 center lines
    selected = np.abs(masks.mean(axis=0) - masks.mean()) < dev
    masks_selected = masks[:, selected]
    indices = rng.choice(masks_selected.shape[1], T)
    masks_out = masks_selected[:, indices].T.astype(np.float32)  # (T, N)
    if T == 1:
        return masks_out[0:1, :]
    return masks_out[:, None, :]


def random_cartesian_mask(W: int, R: float, center_lines_frac: float,
                          seed: Optional[int] = None) -> np.ndarray:
    """Uniform-random line mask with a fully sampled center block
    (reference: undersampling_fourier.py:50-61, the commented-out uniform
    variant kept as a supported preset). Returns (1, 1, W) float32."""
    rng = np.random.RandomState(seed)
    mask = (rng.rand(1, 1, W) <= 1.0 / R).astype(np.float32)
    win_size = int(W * center_lines_frac)
    start = W // 2 - win_size // 2
    mask[..., start:start + win_size] = 1.0
    return mask
