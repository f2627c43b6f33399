"""Pixel-tube reshapes for the 2D+time factorized sampler.

Reference semantics: helpers/utils.py:330-359 `reshape_temporal_dim`:
  forward:  (N, T, H, W) -> (N * H/kx * W/ky, kx * ky, T)
  backward: inverse, given the original (H, W).
This framework is channel-last for conv inputs, so the forward output here is
(N', T, kx * ky): tubes as 1-D signals of length T with kx*ky channels last.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
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


def apply_in_tube_space(fn: Callable, arrays: Sequence[jnp.ndarray],
                        win_size: int, key: Optional[jax.Array] = None,
                        if_random_shift: bool = False):
    """Apply `fn` in pixel-tube space, with a shared optional random shift.

    The 2D+time samplers/optimizers all perform the same dance around their
    temporal score evaluation (reference: ALD_optimizers.py:452-502,
    MAP_optimizers.py:154-337): merge channels into batch
    (B, T, H, W, C) -> (B*C, T, H, W), optionally roll by a random spatial
    shift for window de-aliasing (:471-475,494-498), tube-reshape to
    (B', T, kx*ky), evaluate, then invert everything. This helper owns that
    dance once, for every variant (complex/pair ALD, complex/pair MAP).

    arrays: (B, T, H, W, C) arrays (real or complex), all transformed with
    the SAME shift. `fn(*tubes)` receives the (B', T, win^2) tube arrays and
    returns a tuple of same-shape tube arrays, which are inverse-transformed
    (un-roll included) and returned as a tuple. `key` draws the shift and is
    consumed exactly once (callers keep their own split discipline so PRNG
    trajectories are unchanged)."""
    B, T, H, W, C = arrays[0].shape
    if if_random_shift:
        assert key is not None, "if_random_shift=True needs a key"
        sh, sw = jax.random.randint(key, (2,), 0, win_size)

    def fwd(a):
        fr = jnp.moveaxis(a, -1, 1).reshape(B * C, T, H, W)
        if if_random_shift:
            fr = jnp.roll(fr, (sh, sw), axis=(-2, -1))
        return reshape_temporal_dim(fr, win_size, win_size)

    def bwd(t):
        fr = reshape_temporal_dim(t, win_size, win_size, "backward",
                                  img_size=(H, W))
        if if_random_shift:
            fr = jnp.roll(fr, (-sh, -sw), axis=(-2, -1))
        return jnp.moveaxis(fr.reshape(B, C, T, H, W), 1, -1)

    out = fn(*[fwd(a) for a in arrays])
    return tuple(bwd(t) for t in out)


def reshape_temporal_dim_np(x, kx: int, ky: int):
    """Host/numpy forward tube reshape: (N, T, H, W) -> (N', T, kx*ky).
    Crops H/W down to multiples of the window (dataset prep convenience)."""
    N, T, H, W = x.shape
    x = x[:, :, : H - H % kx, : W - W % ky]
    return rearrange(x, "N T (H1 kx) (W1 ky) -> (N H1 W1) T (kx ky)",
                     kx=kx, ky=ky)
