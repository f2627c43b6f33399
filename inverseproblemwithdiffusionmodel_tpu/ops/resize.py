"""Separable multi-linear resize as dense interpolation matmuls.

The reference's RefineNet MSF blocks use `F.interpolate(..., mode='bilinear',
align_corners=True)` (ncsn/models/layers.py:182) and its data pipeline uses
half-pixel (align_corners=False) resizes. On TPU we express each axis's 1-D
linear interpolation as a dense (out, in) matrix contraction - the matrices
are trace-time constants (static shapes) and the contractions run on the MXU,
which beats gather-based resampling for the small spatial sizes used here.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D linear interpolation matrix W with y = W @ x."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    if align_corners:
        pos = np.arange(out_size) * (in_size - 1) / max(out_size - 1, 1)
    else:
        scale = in_size / out_size
        pos = np.clip((np.arange(out_size) + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    W[np.arange(out_size), lo] += 1.0 - frac
    W[np.arange(out_size), hi] += frac
    return W


def _resize(x: jnp.ndarray, sizes: Sequence[int], axes: Sequence[int],
            align_corners: bool) -> jnp.ndarray:
    axes = [a % x.ndim for a in axes]
    assert len(sizes) == len(axes)
    for size, axis in zip(sizes, axes):
        in_size = x.shape[axis]
        if in_size == size:
            continue
        W = jnp.asarray(_interp_matrix(in_size, size, align_corners),
                        dtype=x.dtype)  # keep bf16 paths bf16
        x = jnp.moveaxis(jnp.tensordot(W, jnp.moveaxis(x, axis, 0), axes=1), 0, axis)
    return x


def resize_align_corners(x: jnp.ndarray, sizes: Sequence[int],
                         axes: Sequence[int]) -> jnp.ndarray:
    """torch F.interpolate(mode='linear|bilinear|trilinear', align_corners=True)."""
    return _resize(x, sizes, axes, align_corners=True)


def resize_half_pixel(x: jnp.ndarray, sizes: Sequence[int],
                      axes: Sequence[int]) -> jnp.ndarray:
    """torch F.interpolate(align_corners=False) / standard half-pixel linear."""
    return _resize(x, sizes, axes, align_corners=False)
