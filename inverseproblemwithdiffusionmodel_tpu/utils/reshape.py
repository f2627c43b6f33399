"""Pixel-tube reshapes for the 2D+time factorized sampler.

Reference semantics: helpers/utils.py:330-359 `reshape_temporal_dim`:
  forward:  (N, T, H, W) -> (N * H/kx * W/ky, kx * ky, T)
  backward: inverse, given the original (H, W).
This framework is channel-last for conv inputs, so the forward output here is
(N', T, kx * ky): tubes as 1-D signals of length T with kx*ky channels last.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from einops import rearrange


def reshape_temporal_dim(x: jnp.ndarray, kx: int, ky: int,
                         direction: str = "forward",
                         img_size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    assert direction in ("forward", "backward")
    if direction == "forward":
        N, T, H, W = x.shape
        assert H % kx == 0 and W % ky == 0, (H, W, kx, ky)
        return rearrange(x, "N T (H1 kx) (W1 ky) -> (N H1 W1) T (kx ky)",
                         kx=kx, ky=ky)
    assert img_size is not None
    H, W = img_size
    assert H % kx == 0 and W % ky == 0
    return rearrange(x, "(N H1 W1) T (kx ky) -> N T (H1 kx) (W1 ky)",
                     H1=H // kx, W1=W // ky, kx=kx, ky=ky)


def reshape_temporal_dim_np(x, kx: int, ky: int):
    """Host/numpy forward tube reshape: (N, T, H, W) -> (N', T, kx*ky).
    Crops H/W down to multiples of the window (dataset prep convenience)."""
    N, T, H, W = x.shape
    x = x[:, :, : H - H % kx, : W - W % ky]
    return rearrange(x, "N T (H1 kx) (W1 ky) -> (N H1 W1) T (kx ky)",
                     kx=kx, ky=ky)
