"""Centered orthonormal FFT pair for MR k-space.

Reference semantics: ncsn/linear_transforms/__init__.py:36-57
(i2k = fftshift(fftn(ifftshift(x))), norm="ortho", complex64) over the last
two dims of channel-first tensors. This framework is channel-last, so the
spatial axes are explicit; defaults assume (B, H, W, C).

jnp.fft on TPU lowers to XLA's native FFT - no custom kernel needed; the
shifts fuse into the surrounding computation.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

# (B, H, W, C) spatial axes
DEFAULT_AXES: Tuple[int, int] = (-3, -2)


def i2k_complex(x: jnp.ndarray, axes: Sequence[int] = DEFAULT_AXES) -> jnp.ndarray:
    """Image -> centered k-space (orthonormal)."""
    axes = tuple(axes)
    x = x.astype(jnp.complex64)
    x = jnp.fft.ifftshift(x, axes=axes)
    k = jnp.fft.fftn(x, axes=axes, norm="ortho")
    return jnp.fft.fftshift(k, axes=axes)


def k2i_complex(k: jnp.ndarray, axes: Sequence[int] = DEFAULT_AXES) -> jnp.ndarray:
    """Centered k-space -> image (orthonormal)."""
    axes = tuple(axes)
    k = k.astype(jnp.complex64)
    k = jnp.fft.ifftshift(k, axes=axes)
    x = jnp.fft.ifftn(k, axes=axes, norm="ortho")
    return jnp.fft.fftshift(x, axes=axes)
