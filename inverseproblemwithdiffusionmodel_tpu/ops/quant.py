"""int8 conv quantization — the serving fast path for score-net forwards.

The ALD hot loop is compute-bound in the score network's 3x3 convs
(ARCHITECTURE.md "Performance summary"); the v5e MXU's int8 peak is 2x the
bf16 rate, and this module provides that path without touching model code:

- weights: symmetric per-OUTPUT-CHANNEL int8 (scale = amax / 127 over each
  (*, *, I) slice), computed inside the traced forward — XLA hoists the
  (cheap, O(params)) quantization out of the sampler's level scan;
- activations: symmetric per-TENSOR int8 with a dynamic scale (amax / 127
  computed on the fly) — robust to the huge activation-magnitude range an
  annealed sampler sweeps (inputs go from N(0, sigma_max^2) noise to clean
  images across the ladder);
- accumulation: int32 on the MXU (`preferred_element_type`), dequantized by
  the rank-1 scale product, so the only low-precision rounding is one
  round-to-nearest per operand.

`models.layers.Conv` consults `conv_quant_mode()` at TRACE time: wrap the
forward in `with quantized_convs("int8")` (or build the score function via
`make_score_fn(..., compute_dtype="int8")`, which does it for you). Because
the mode is read when a function is traced, enable it only inside a
function that is itself freshly created per mode (as make_score_fn does) —
re-jitting one shared callable under different modes would silently reuse
the first compilation.

Inference-only: `jnp.round` has zero gradient, so the quantized path must
not be used for training forwards (DSM losses never enable it). Everything
around the convs (norms, ELU, resampling, biases) stays in the caller's
float dtype; quality is validated end-to-end in
examples/train_and_reconstruct_demo.py (int8 recon NRMSE 0.2137 vs f32
0.2138, SSIM 0.553 vs 0.554 on trained weights).

Measured end-to-end (bench.py BENCH_DTYPE=int8, 256^2 ngf128 16 chains):
92.56 vs 90.17 bf16 chain-steps/s/chip — only +2.6%. Isolated at the hot
conv shape (amortized 12-conv chains, (32,256,256,128) x 3x3x128x128,
2026-08-19): bf16 109 TFLOP/s; int8 with static scales 138 (1.27x — XLA's
s8xs8->s32 conv at this shape is far from the 2x MXU peak ratio); int8
with the dynamic per-conv amax+rewrite 124 (the quant passes cost ~10%).
So the achievable conv-level win is ~1.13x and even a fused
producer-quant pallas kernel (norm/ELU -> amax -> s8 write) would only
recover ~+7% end-to-end — not worth the kernel. int8 stays opt-in; bf16
is the default.

Reference scope: the reference has no quantized path (fp32 CUDA convs,
ncsn/models/ncsnv2.py); this is a TPU-native serving addition.
"""
from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

_CONV_QUANT_MODE: ContextVar[Optional[str]] = ContextVar(
    "conv_quant_mode", default=None)

_EPS = 1e-12


def conv_quant_mode() -> Optional[str]:
    """The active conv quantization mode (None or "int8") — consulted by
    models.layers.Conv while tracing."""
    return _CONV_QUANT_MODE.get()


@contextmanager
def quantized_convs(mode: str = "int8"):
    """Trace-time switch: every models.layers.Conv applied under this
    context lowers to an int8 MXU conv (see module docstring for the
    jit-cache caveat)."""
    if mode not in ("int8",):
        raise ValueError(f"unknown conv quant mode {mode!r}")
    token = _CONV_QUANT_MODE.set(mode)
    try:
        yield
    finally:
        _CONV_QUANT_MODE.reset(token)


def quantize_per_channel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """(*spatial, I, O) kernel -> (int8 kernel, f32 scale (O,)).
    Symmetric: q = round(w / s), s = amax_per_outchannel / 127."""
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=tuple(range(kernel.ndim - 1)))
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_per_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x -> (int8 x, f32 scalar scale). Symmetric dynamic quantization."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32))
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, *,
              window_strides: Sequence[int],
              padding: Sequence[Tuple[int, int]],
              rhs_dilation: Sequence[int],
              dimension_numbers: Tuple[str, str, str]) -> jnp.ndarray:
    """Drop-in for the lax.conv_general_dilated call in models.layers.Conv:
    quantize both operands, convolve s8 x s8 -> s32 on the MXU, dequantize
    with the rank-1 scale product. Output dtype == x.dtype (channel-last:
    the per-out-channel weight scale broadcasts over the trailing axis)."""
    xq, sx = quantize_per_tensor(x)
    kq, sw = quantize_per_channel(kernel)
    out = lax.conv_general_dilated(
        xq, kq,
        window_strides=tuple(window_strides),
        padding=list(padding),
        rhs_dilation=tuple(rhs_dilation),
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
