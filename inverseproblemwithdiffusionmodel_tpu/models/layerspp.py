"""NCSN++ / DDPM++ building blocks (continuous model zoo).

Reference semantics: models/layerspp.py (GaussianFourierProjection :32,
Combine :44, AttnBlockpp :62-91, FIR Upsample/Downsample :94-163,
ResnetBlockDDPMpp :166, ResnetBlockBigGANpp :212) and
models/layers.py (`get_timestep_embedding` :516, `NIN` :547,
`variance_scaling`/`default_init` :54-97).

TPU-first: channel-last NHWC; FIR resampling auto-dispatches to the
polyphase Pallas kernels on TPU (20x the XLA lhs-dilated-conv formulation
on v5e) with exact gradients via linear transpose
(ops/pallas_kernels.fir_upsample_2x), XLA elsewhere; attention is two
einsums that XLA maps onto the MXU.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.upfirdn2d import upsample_conv_2d, conv_downsample_2d
from ..ops.pallas_kernels import (fir_upsample_2x as upsample_2d_fn,
                                  fir_downsample_2x as downsample_2d_fn)


def default_init(scale: float = 1.0):
    """DDPM-style variance-scaling uniform init (reference:
    models/layers.py:54-97; scale==0 means 1e-10)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def _group_count(ch: int) -> int:
    return min(max(ch // 4, 1), 32)


def group_norm(ch: int, name: str, num_groups: Optional[int] = None):
    """GroupNorm with the NCSN++ min(ch//4, 32) group count by default
    (layerspp.py GroupNorm call sites); the original DDPM UNet pins 32
    groups regardless of width (models/layers.py:563,626) - pass
    num_groups for that convention."""
    return nn.GroupNorm(num_groups=num_groups or _group_count(ch),
                        epsilon=1e-6, name=name)


def ddpm_conv3x3(features: int, init_scale: float = 1.0, stride: int = 1,
                 use_bias: bool = True, name: Optional[str] = None):
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=use_bias, kernel_init=default_init(init_scale),
                   bias_init=nn.initializers.zeros, name=name)


def ddpm_conv1x1(features: int, init_scale: float = 1.0, stride: int = 1,
                 use_bias: bool = True, name: Optional[str] = None):
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding=0,
                   use_bias=use_bias, kernel_init=default_init(init_scale),
                   bias_init=nn.initializers.zeros, name=name)


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           max_positions: int = 10000) -> jnp.ndarray:
    """Sinusoidal embeddings (reference: models/layers.py:516-530)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class GaussianFourierProjection(nn.Module):
    """Random Fourier features of log-sigma; the projection matrix is frozen
    (reference: layerspp.py:32-40 `requires_grad=False`)."""
    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        W = self.param("W", nn.initializers.normal(stddev=self.scale),
                       (self.embedding_size,))
        W = jax.lax.stop_gradient(W)
        x_proj = x[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class NIN(nn.Module):
    """1x1 'network-in-network' dense over the channel axis
    (reference: models/layers.py:547-556)."""
    features: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        W = self.param("W", default_init(self.init_scale),
                       (x.shape[-1], self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        return jnp.einsum("...c,cd->...d", x, W) + b


class Combine(nn.Module):
    """Combine a pyramid input with a skip (reference: layerspp.py:44-57)."""
    features: int
    method: str = "cat"

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = ddpm_conv1x1(self.features, name="Conv_0")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"combine method {self.method!r} not recognized")


class AttnBlockpp(nn.Module):
    """Channel self-attention over all spatial positions
    (reference: layerspp.py:62-91)."""
    skip_rescale: bool = False
    init_scale: float = 0.0
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = group_norm(C, "GroupNorm_0", self.num_groups)(x)
        q = NIN(C, name="NIN_0")(h)
        k = NIN(C, name="NIN_1")(h)
        v = NIN(C, name="NIN_2")(h)

        w = jnp.einsum("bhwc,bijc->bhwij", q, k) * (C ** -0.5)
        w = w.reshape(B, H, W, H * W)
        w = jax.nn.softmax(w, axis=-1)
        w = w.reshape(B, H, W, H, W)
        h = jnp.einsum("bhwij,bijc->bhwc", w, v)
        h = NIN(C, init_scale=self.init_scale, name="NIN_3")(h)
        out = x + h
        return out / np.sqrt(2.0) if self.skip_rescale else out


class Upsample(nn.Module):
    """2x upsample, optional conv, optional FIR filter
    (reference: layerspp.py:94-128)."""
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        out_ch = self.out_ch or C
        if not self.fir:
            h = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
            if self.with_conv:
                h = ddpm_conv3x3(out_ch, name="Conv_0")(h)
            return h
        if not self.with_conv:
            return upsample_2d_fn(x, self.fir_kernel)
        # fused conv-transpose + FIR (StyleGAN2 Conv2d up=True)
        w = self.param("Conv2d_0_weight", default_init(),
                       (3, 3, C, out_ch))
        b = self.param("Conv2d_0_bias", nn.initializers.zeros, (out_ch,))
        h = upsample_conv_2d(x, w, k=self.fir_kernel, factor=2)
        return h + b


class Downsample(nn.Module):
    """2x downsample, optional conv, optional FIR filter
    (reference: layerspp.py:129-163)."""
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        out_ch = self.out_ch or C
        if not self.fir:
            if self.with_conv:
                # pad right/bottom by 1 then stride-2 conv (DDPM convention)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                return nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                               kernel_init=default_init(),
                               name="Conv_0")(x)
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        if not self.with_conv:
            return downsample_2d_fn(x, self.fir_kernel)
        w = self.param("Conv2d_0_weight", default_init(),
                       (3, 3, C, out_ch))
        b = self.param("Conv2d_0_bias", nn.initializers.zeros, (out_ch,))
        h = conv_downsample_2d(x, w, k=self.fir_kernel, factor=2)
        return h + b


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style residual block (reference: layerspp.py:166-210)."""
    act: Callable[[jnp.ndarray], jnp.ndarray]
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    temb_dim: Optional[int] = None
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = self.act(group_norm(C, "GroupNorm_0", self.num_groups)(x))
        h = ddpm_conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init(),
                             bias_init=nn.initializers.zeros,
                             name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, "GroupNorm_1", self.num_groups)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = ddpm_conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1")(h)
        if C != out_ch:
            if self.conv_shortcut:
                x = ddpm_conv3x3(out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        out = x + h
        return out / np.sqrt(2.0) if self.skip_rescale else out


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * factor, W * factor, C), "nearest")


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    return x.mean(axis=(2, 4))


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with in-block up/down sampling
    (reference: layerspp.py:212-274)."""
    act: Callable[[jnp.ndarray], jnp.ndarray]
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    temb_dim: Optional[int] = None
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = self.act(group_norm(C, "GroupNorm_0", self.num_groups)(x))

        if self.up:
            resample = (lambda v: upsample_2d_fn(v, self.fir_kernel)) \
                if self.fir else naive_upsample_2d
            h, x = resample(h), resample(x)
        elif self.down:
            resample = (lambda v: downsample_2d_fn(v, self.fir_kernel)) \
                if self.fir else naive_downsample_2d
            h, x = resample(h), resample(x)

        h = ddpm_conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init(),
                             bias_init=nn.initializers.zeros,
                             name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, "GroupNorm_1", self.num_groups)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = ddpm_conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1")(h)

        if C != out_ch or self.up or self.down:
            x = ddpm_conv1x1(out_ch, name="Conv_2")(x)

        out = x + h
        return out / np.sqrt(2.0) if self.skip_rescale else out
