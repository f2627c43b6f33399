"""upfirdn2d (upsample -> FIR filter -> downsample) as a single XLA conv.

The reference ships a hand-written CUDA kernel for this StyleGAN2 op
(op/upfirdn2d_kernel.cu, with the CPU oracle `upfirdn2d_native` at
op/upfirdn2d.py:168-209). On TPU the whole pipeline - zero-insertion
upsampling, asymmetric (possibly negative) padding, 2-D FIR correlation and
strided decimation - is exactly one `lax.conv_general_dilated` call:

    lhs_dilation = (up, up)          # zero-insertion upsample
    padding      = explicit, +up-1 on the high side to keep the trailing
                   zeros the reference's pad-based upsample produces
    kernel       = FIR filter, flipped (the reference correlates with a
                   flipped kernel == true convolution)
    window_strides = (down, down)    # decimation

XLA fuses this into one MXU/VPU kernel with the surrounding ops, including
its transpose for the backward pass - so unlike the CUDA original, no custom
autograd (op/upfirdn2d.py:21-144) is needed.

A Pallas fused depthwise variant lives in ops/pallas_kernels.py for the hot
separable-filter path; this module is the reference implementation and
gradient oracle.

Arrays are channel-last: x (N, H, W, C); filter k (kh, kw).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp
from jax import lax


def _setup_kernel(k) -> np.ndarray:
    """Normalize a FIR filter; 1-D filters become separable outer products
    (reference: models/up_or_down_sampling.py:182-189)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Sequence[int] = (0, 0),
) -> jnp.ndarray:
    """Apply upfirdn to a batch of channel-last images.

    x: (N, H, W, C); kernel: (kh, kw) applied per-channel.
    pad: (p0, p1) applied to both spatial axes, or (px0, px1, py0, py1).
    Matches reference op/upfirdn2d.py:147-165 output:
      out_h = (H * up + pad_y0 + pad_y1 - kh) // down + 1.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    N, H, W, C = x.shape
    kh, kw = kernel.shape
    # Flip: the reference correlates with the flipped filter (true convolution).
    w = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    w = jnp.tile(w[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise

    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out


def upsample_2d(x: jnp.ndarray, k: Optional[Sequence[float]] = None,
                factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR upsampling (reference: models/up_or_down_sampling.py:195-224)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    kern = _setup_kernel(k) * (gain * (factor**2))
    p = kern.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(kern), up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jnp.ndarray, k: Optional[Sequence[float]] = None,
                  factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR downsampling (reference: models/up_or_down_sampling.py:227-257)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    kern = _setup_kernel(k) * gain
    p = kern.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(kern), down=factor,
                     pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: jnp.ndarray, w: jnp.ndarray,
                     k: Optional[Sequence[float]] = None,
                     factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """Fused 2x conv-transpose upsample + FIR
    (reference: models/up_or_down_sampling.py:72-141).

    x: (N, H, W, C_in); w: (kh, kw, C_in, C_out) HWIO.
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw
    if k is None:
        k = [1.0] * factor
    kern = _setup_kernel(k) * (gain * (factor**2))
    p = (kern.shape[0] - factor) - (kw - 1)

    # The reference's conv_transpose with pre-flipped io-swapped weights
    # (up_or_down_sampling.py:125-129) nets out to a plain correlation with w
    # on the zero-dilated, fully padded input - one conv_general_dilated here.
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(out, jnp.asarray(kern),
                     pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: jnp.ndarray, w: jnp.ndarray,
                       k: Optional[Sequence[float]] = None,
                       factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """Fused FIR + strided conv downsample
    (reference: models/up_or_down_sampling.py:144-179)."""
    assert isinstance(factor, int) and factor >= 1
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw
    if k is None:
        k = [1.0] * factor
    kern = _setup_kernel(k) * gain
    p = (kern.shape[0] - factor) + (kw - 1)
    x = upfirdn2d(x, jnp.asarray(kern), pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        x, w, window_strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
