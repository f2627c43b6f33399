"""Fused bias + leaky-ReLU activation.

The reference ships a CUDA elementwise kernel for
`y = scale * leaky_relu(x + bias)` (op/fused_bias_act_kernel.cu:36-47,
op/fused_act.py:89-100). On TPU this is a pure VPU elementwise chain that
XLA fuses into the surrounding convolution automatically; the jnp expression
below IS the optimal implementation. A Pallas version is provided in
ops/pallas_kernels.py for standalone use / parity with the reference's
shipped kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray = None,
                     negative_slope: float = 0.2,
                     scale: float = 2**0.5) -> jnp.ndarray:
    """x: (..., C) channel-last; bias: (C,)."""
    if bias is not None:
        x = x + bias
    return scale * jnp.where(x >= 0, x, negative_slope * x)
