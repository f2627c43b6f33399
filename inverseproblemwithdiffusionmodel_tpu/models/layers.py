"""Rank-generic NCSN building blocks (RefineNet family), channel-last.

One implementation replaces the reference's three near-identical copies
(ncsn/models/layers.py, layers1d.py, layers3d.py - 1,404 LoC total): every
block takes `ndim` (number of spatial dims) and lowers to
`lax.conv_general_dilated` / `lax.reduce_window` with NWC / NHWC / NDHWC
layouts - the native TPU conv layouts.

Initialization matches torch defaults for checkpoint-level training parity:
conv/linear weights ~ kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
biases ~ U(+-1/sqrt(fan_in)).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops import quant


# ---------------------------------------------------------------------------
# Activations (reference: ncsn/models/layers.py:11-23)
# ---------------------------------------------------------------------------

def centered_input(config) -> bool:
    """Whether inputs already live in [-1, 1] (skip the `2x - 1` affine).

    The discrete stack spells this `data.logit_transform or data.rescaled`
    (reference: ncsn/models/ncsnv2.py:76-79); the continuous stack spells
    it `data.centered` (reference: models/ncsnv2.py:47,106-110). The NCSN
    family here serves both config trees, so accept either spelling.
    """
    data = config.data
    if hasattr(data, "centered"):
        return bool(data.centered)
    return bool(data.logit_transform or data.rescaled)


def get_act(config) -> Callable[[jnp.ndarray], jnp.ndarray]:
    name = config.model.nonlinearity.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return partial(jax.nn.leaky_relu, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError("activation function does not exist!")


# ---------------------------------------------------------------------------
# Conv primitive with torch-parity init and padding
# ---------------------------------------------------------------------------

def _dim_numbers(ndim: int):
    spatial = "DHW"[3 - ndim:]
    return (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on (*spatial, in, out) kernels."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """N-D convolution, torch Conv semantics (explicit symmetric padding,
    dilation, stride), channel-last."""
    features: int
    kernel_size: int
    ndim: int = 2
    stride: int = 1
    padding: Optional[int] = None      # None -> kernel_size // 2 per side
    dilation: int = 1
    use_bias: bool = True
    pre_pad: Optional[Tuple[int, int]] = None  # extra (lo, hi) zero pad per axis

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        pad = self.padding if self.padding is not None else (
            (k // 2) * self.dilation if k > 1 else 0)
        kernel_shape = (k,) * self.ndim + (x.shape[-1], self.features)
        kernel = self.param("kernel", torch_kernel_init, kernel_shape)
        pads = [(pad, pad)] * self.ndim
        if self.pre_pad is not None:
            pads = [(p0 + self.pre_pad[0], p1 + self.pre_pad[1])
                    for p0, p1 in pads]
        if quant.conv_quant_mode() == "int8":
            # serving fast path: s8 x s8 -> s32 on the MXU (2x bf16 rate on
            # v5e), dynamic per-tensor act scale + per-out-channel weight
            # scale; enabled per-trace via ops.quant.quantized_convs
            out = quant.int8_conv(
                x, kernel,
                window_strides=(self.stride,) * self.ndim,
                padding=pads,
                rhs_dilation=(self.dilation,) * self.ndim,
                dimension_numbers=_dim_numbers(self.ndim),
            )
        else:
            out = lax.conv_general_dilated(
                x, kernel,
                window_strides=(self.stride,) * self.ndim,
                padding=pads,
                rhs_dilation=(self.dilation,) * self.ndim,
                dimension_numbers=_dim_numbers(self.ndim),
            )
        if self.use_bias:
            fan_in = int(np.prod(kernel_shape[:-1]))
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                      -bound, bound),
                (self.features,))
            out = out + bias
        return out


class ConvTranspose(nn.Module):
    """Transposed conv with torch semantics: out = (in-1)*s - 2p + k.
    Supports per-axis kernel/stride/padding (needed by NCSN3DShallow's
    asymmetric temporal upsampling, ncsn/models/ncsn3d.py:177)."""
    features: int
    kernel_size: Tuple[int, ...]
    stride: Tuple[int, ...]
    padding: Tuple[int, ...]
    ndim: int = 3
    output_padding: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.kernel_size
        kernel_shape = tuple(ks) + (x.shape[-1], self.features)
        # torch ConvTranspose stores (in, out, *k); fan_in = out * prod(k)
        fan_in = int(self.features * np.prod(ks))
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            kernel_shape)
        # conv_transpose == correlation of the zero-dilated input with the
        # spatially FLIPPED kernel (torch semantics), padded with (k - 1 - p)
        # per side; torch output_padding adds to the high side
        op = self.output_padding or (0,) * self.ndim
        pads = [(k - 1 - p, k - 1 - p + o)
                for k, p, o in zip(ks, self.padding, op)]
        out = lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=tuple(range(self.ndim))),
            window_strides=(1,) * self.ndim,
            padding=pads,
            lhs_dilation=tuple(self.stride),
            dimension_numbers=_dim_numbers(self.ndim),
        )
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (self.features,))
        return out + bias


def conv1x1(features: int, ndim: int = 2, stride: int = 1,
            use_bias: bool = True) -> Conv:
    return Conv(features=features, kernel_size=1, ndim=ndim, stride=stride,
                padding=0, use_bias=use_bias)


def conv3x3(features: int, ndim: int = 2, stride: int = 1,
            use_bias: bool = True, dilation: int = 1) -> Conv:
    return Conv(features=features, kernel_size=3, ndim=ndim, stride=stride,
                dilation=dilation, use_bias=use_bias)


# ---------------------------------------------------------------------------
# Pooling (torch MaxPoolNd / AvgPoolNd(count_include_pad=True) semantics)
# ---------------------------------------------------------------------------

def max_pool(x: jnp.ndarray, ndim: int, window: int = 5, stride: int = 1,
             padding: int = 2) -> jnp.ndarray:
    dims = (1,) + (window,) * ndim + (1,)
    strides = (1,) + (stride,) * ndim + (1,)
    pads = ((0, 0),) + ((padding, padding),) * ndim + ((0, 0),)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, pads)


def avg_pool(x: jnp.ndarray, ndim: int, window: int = 5, stride: int = 1,
             padding: int = 2) -> jnp.ndarray:
    """count_include_pad=True: divide by the full window size always."""
    dims = (1,) + (window,) * ndim + (1,)
    strides = (1,) + (stride,) * ndim + (1,)
    pads = ((0, 0),) + ((padding, padding),) * ndim + ((0, 0),)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    return summed / (window ** ndim)


def mean_pool_2x(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """2x decimating mean pool over all spatial dims (the reference's
    sum-of-shifted-slices / 2^ndim, layers.py:311-313)."""
    return avg_pool(x, ndim, window=2, stride=2, padding=0)


def nearest_up_2x(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """2x nearest-neighbor upsample == the reference's cat-4-copies +
    PixelShuffle trick (layers.py:337-341)."""
    for axis in range(1, 1 + ndim):
        x = jnp.repeat(x, 2, axis=axis)
    return x


# ---------------------------------------------------------------------------
# RefineNet blocks (reference: ncsn/models/layers.py:62-456)
# ---------------------------------------------------------------------------

class CRPBlock(nn.Module):
    """Chained residual pooling (reference: layers.py:62-83)."""
    features: int
    n_stages: int
    act: Callable
    ndim: int = 2
    maxpool: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pool = max_pool if self.maxpool else avg_pool
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = pool(path, self.ndim)
            path = conv3x3(self.features, self.ndim, use_bias=False,
                           )(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (reference: layers.py:112-134)."""
    features: int
    n_blocks: int
    n_stages: int
    act: Callable
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.act(x)
                x = conv3x3(self.features, self.ndim, use_bias=False)(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: per-input conv, resize to target shape
    (align_corners=True multi-linear), sum (reference: layers.py:165-184)."""
    features: int
    ndim: int = 2

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 shape: Sequence[int]) -> jnp.ndarray:
        from ..ops.resize import resize_align_corners
        total = None
        for x in xs:
            h = conv3x3(self.features, self.ndim, use_bias=True)(x)
            h = resize_align_corners(h, tuple(shape),
                                     axes=tuple(range(1, 1 + self.ndim)))
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block: adapt RCUs -> MSF -> CRP -> output RCUs
    (reference: layers.py:214-249)."""
    features: int
    act: Callable
    ndim: int = 2
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 output_shape: Sequence[int]) -> jnp.ndarray:
        hs = []
        for i, x in enumerate(xs):
            h = RCUBlock(features=x.shape[-1], n_blocks=2, n_stages=2,
                         act=self.act, ndim=self.ndim, name=f"adapt_{i}")(x)
            hs.append(h)
        if len(xs) > 1:
            h = MSFBlock(features=self.features, ndim=self.ndim,
                         name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(features=self.features, n_stages=2, act=self.act,
                     ndim=self.ndim, maxpool=self.maxpool, name="crp")(h)
        h = RCUBlock(features=self.features, n_blocks=3 if self.end else 1,
                     n_stages=2, act=self.act, ndim=self.ndim,
                     name="output")(h)
        return h


class ConvMeanPool(nn.Module):
    """conv (stride 1) then 2x mean pool (reference: layers.py:291-313).
    adjust_padding pre-pads (1, 0) per spatial axis (28x28 inputs)."""
    features: int
    kernel_size: int = 3
    ndim: int = 2
    use_bias: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pre = (1, 0) if self.adjust_padding else None
        out = Conv(features=self.features, kernel_size=self.kernel_size,
                   ndim=self.ndim, padding=self.kernel_size // 2,
                   use_bias=self.use_bias, pre_pad=pre)(x)
        return mean_pool_2x(out, self.ndim)


class MeanPoolConv(nn.Module):
    """2x mean pool then conv (reference: layers.py:315-326)."""
    features: int
    kernel_size: int = 3
    ndim: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = mean_pool_2x(x, self.ndim)
        return Conv(features=self.features, kernel_size=self.kernel_size,
                    ndim=self.ndim, padding=self.kernel_size // 2,
                    use_bias=self.use_bias)(out)


class UpsampleConv(nn.Module):
    """2x nearest upsample then conv (reference: layers.py:329-341)."""
    features: int
    kernel_size: int = 3
    ndim: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nearest_up_2x(x, self.ndim)
        return Conv(features=self.features, kernel_size=self.kernel_size,
                    ndim=self.ndim, padding=self.kernel_size // 2,
                    use_bias=self.use_bias)(out)


class ResidualBlock(nn.Module):
    """Pre-activation residual block (reference: layers.py:401-456).

    resample='down' with dilation: two dilated convs, dilated shortcut (no
    spatial change); resample='down' without dilation: conv + ConvMeanPool,
    1x1 ConvMeanPool shortcut; resample=None: plain / dilated convs with
    conv1x1 shortcut when widths differ.
    """
    output_dim: int
    normalization: Any
    act: Callable
    ndim: int = 2
    resample: Optional[str] = None
    dilation: Optional[int] = None
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        input_dim = x.shape[-1]
        norm = self.normalization
        d = self.dilation

        if self.resample == "down":
            if d is not None and d > 1:
                conv1 = conv3x3(input_dim, self.ndim, dilation=d)
                conv2 = conv3x3(self.output_dim, self.ndim, dilation=d)
                shortcut_mod = conv3x3(self.output_dim, self.ndim, dilation=d)
                norm2_dim = input_dim
            else:
                conv1 = conv3x3(input_dim, self.ndim)
                conv2 = ConvMeanPool(features=self.output_dim, ndim=self.ndim,
                                     adjust_padding=self.adjust_padding)
                shortcut_mod = ConvMeanPool(
                    features=self.output_dim, kernel_size=1, ndim=self.ndim,
                    adjust_padding=self.adjust_padding)
                norm2_dim = input_dim
        elif self.resample is None:
            if d is not None and d > 1:
                conv1 = conv3x3(self.output_dim, self.ndim, dilation=d)
                conv2 = conv3x3(self.output_dim, self.ndim, dilation=d)
                shortcut_mod = conv3x3(self.output_dim, self.ndim, dilation=d)
                norm2_dim = self.output_dim
            else:
                conv1 = conv3x3(self.output_dim, self.ndim)
                conv2 = conv3x3(self.output_dim, self.ndim)
                shortcut_mod = conv1x1(self.output_dim, self.ndim)
                norm2_dim = self.output_dim
        else:
            raise ValueError("invalid resample value")

        out = norm(num_features=input_dim, name="norm1")(x)
        out = self.act(out)
        out = conv1(out)
        out = norm(num_features=norm2_dim, name="norm2")(out)
        out = self.act(out)
        out = conv2(out)

        if self.output_dim == input_dim and self.resample is None:
            shortcut = x
        else:
            shortcut = shortcut_mod(x)
        return shortcut + out


class ConditionalResidualBlock(nn.Module):
    """Class-conditional variant (reference: layers.py:344-398); norms take
    the label y."""
    output_dim: int
    normalization: Any
    num_classes: int
    act: Callable
    ndim: int = 2
    resample: Optional[str] = None
    dilation: Optional[int] = None
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        input_dim = x.shape[-1]
        d = self.dilation

        def make_norm(dim, name):
            return self.normalization(num_features=dim,
                                      num_classes=self.num_classes, name=name)

        if self.resample == "down":
            if d is not None and d > 1:
                conv1 = conv3x3(input_dim, self.ndim, dilation=d)
                conv2 = conv3x3(self.output_dim, self.ndim, dilation=d)
                shortcut_mod = conv3x3(self.output_dim, self.ndim, dilation=d)
                norm2_dim = input_dim
            else:
                conv1 = conv3x3(input_dim, self.ndim)
                conv2 = ConvMeanPool(features=self.output_dim, ndim=self.ndim,
                                     adjust_padding=self.adjust_padding)
                shortcut_mod = ConvMeanPool(
                    features=self.output_dim, kernel_size=1, ndim=self.ndim,
                    adjust_padding=self.adjust_padding)
                norm2_dim = input_dim
        elif self.resample is None:
            if d is not None and d > 1:
                conv1 = conv3x3(self.output_dim, self.ndim, dilation=d)
                conv2 = conv3x3(self.output_dim, self.ndim, dilation=d)
                shortcut_mod = conv3x3(self.output_dim, self.ndim, dilation=d)
                norm2_dim = self.output_dim
            else:
                conv1 = conv3x3(self.output_dim, self.ndim)
                conv2 = conv3x3(self.output_dim, self.ndim)
                shortcut_mod = conv1x1(self.output_dim, self.ndim)
                norm2_dim = self.output_dim
        else:
            raise ValueError("invalid resample value")

        out = make_norm(input_dim, "norm1")(x, y)
        out = self.act(out)
        out = conv1(out)
        out = make_norm(norm2_dim, "norm2")(out, y)
        out = self.act(out)
        out = conv2(out)

        if self.output_dim == input_dim and self.resample is None:
            shortcut = x
        else:
            shortcut = shortcut_mod(x)
        return shortcut + out
