"""NCSN v1: class-conditional-normalization RefineNet score network.

Reference semantics: ncsn/models/ncsn.py (NCSN :9-100, NCSNdeeper :102-188)
with the conditional RefineNet family of ncsn/models/layers.py
(CondCRPBlock :85-109, CondRCUBlock :136-162, CondMSFBlock :186-212,
CondRefineBlock :252-289). The noise level enters through conditional
InstanceNorm++ (normalization.py ConditionalInstanceNorm2dPlus), NOT by
dividing the output — v1 predates NCSNv2's sigma-division.

Channel-last NHWC; `y` is the integer noise-level label (B,).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import (Conv, conv3x3, get_act, avg_pool,
                     ConditionalResidualBlock, centered_input)
from .normalization import get_normalization
from ..ops.resize import resize_align_corners


class CondCRPBlock(nn.Module):
    """Conditional chained residual pooling; avg-pool variant
    (reference: layers.py:85-109)."""
    features: int
    n_stages: int
    num_classes: int
    normalizer: Any
    act: Callable
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(num_features=self.features,
                                   num_classes=self.num_classes,
                                   name=f"norm_{i}")(path, y)
            path = avg_pool(path, self.ndim)
            path = conv3x3(self.features, self.ndim, use_bias=False,
                           )(path)
            x = path + x
        return x


class CondRCUBlock(nn.Module):
    """Conditional residual conv units (reference: layers.py:136-162)."""
    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    normalizer: Any
    act: Callable
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(num_features=self.features,
                                    num_classes=self.num_classes,
                                    name=f"norm_{i}_{j}")(x, y)
                x = self.act(x)
                x = conv3x3(self.features, self.ndim, use_bias=False)(x)
            x = x + residual
        return x


class CondMSFBlock(nn.Module):
    """Conditional multi-scale fusion (reference: layers.py:186-212)."""
    features: int
    num_classes: int
    normalizer: Any
    ndim: int = 2

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], y: jnp.ndarray,
                 shape: Sequence[int]) -> jnp.ndarray:
        total = None
        for i, x in enumerate(xs):
            h = self.normalizer(num_features=x.shape[-1],
                                num_classes=self.num_classes,
                                name=f"norm_{i}")(x, y)
            h = conv3x3(self.features, self.ndim, use_bias=True)(h)
            h = resize_align_corners(h, tuple(shape),
                                     axes=tuple(range(1, 1 + self.ndim)))
            total = h if total is None else total + h
        return total


class CondRefineBlock(nn.Module):
    """Conditional RefineNet block (reference: layers.py:252-289)."""
    features: int
    num_classes: int
    normalizer: Any
    act: Callable
    ndim: int = 2
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], y: jnp.ndarray,
                 output_shape: Sequence[int]) -> jnp.ndarray:
        hs = []
        for i, x in enumerate(xs):
            h = CondRCUBlock(features=x.shape[-1], n_blocks=2, n_stages=2,
                             num_classes=self.num_classes,
                             normalizer=self.normalizer, act=self.act,
                             ndim=self.ndim, name=f"adapt_{i}")(x, y)
            hs.append(h)
        if len(xs) > 1:
            h = CondMSFBlock(features=self.features,
                             num_classes=self.num_classes,
                             normalizer=self.normalizer, ndim=self.ndim,
                             name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(features=self.features, n_stages=2,
                         num_classes=self.num_classes,
                         normalizer=self.normalizer, act=self.act,
                         ndim=self.ndim, name="crp")(h, y)
        h = CondRCUBlock(features=self.features,
                         n_blocks=3 if self.end else 1, n_stages=2,
                         num_classes=self.num_classes,
                         normalizer=self.normalizer, act=self.act,
                         ndim=self.ndim, name="output")(h, y)
        return h


class NCSN(nn.Module):
    """NCSN v1, 4 conditional residual stages + 4 conditional RefineNet
    stages (reference: ncsn/models/ncsn.py:9-100)."""
    config: Any
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        num_classes = cfg.model.num_classes
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=True)
        adjust = cfg.data.image_size == 28
        y = y.astype(jnp.int32)

        h = x if centered_input(cfg) else 2 * x - 1

        def res(out_dim, resample=None, dilation=None, adjust_padding=False,
                name=None):
            return ConditionalResidualBlock(
                output_dim=out_dim, normalization=norm,
                num_classes=num_classes, act=act, ndim=self.ndim,
                resample=resample, dilation=dilation,
                adjust_padding=adjust_padding, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=self.ndim,
                      name="begin_conv")(h)
        layer1 = res(ngf, name="res1_0")(output, y)
        layer1 = res(ngf, name="res1_1")(layer1, y)
        layer2 = res(2 * ngf, resample="down", name="res2_0")(layer1, y)
        layer2 = res(2 * ngf, name="res2_1")(layer2, y)
        layer3 = res(2 * ngf, resample="down", dilation=2,
                     name="res3_0")(layer2, y)
        layer3 = res(2 * ngf, dilation=2, name="res3_1")(layer3, y)
        layer4 = res(2 * ngf, resample="down", dilation=4,
                     adjust_padding=adjust, name="res4_0")(layer3, y)
        layer4 = res(2 * ngf, dilation=4, name="res4_1")(layer4, y)

        sdims = lambda t: t.shape[1:1 + self.ndim]
        rb = lambda feats, name, **kw: CondRefineBlock(
            features=feats, num_classes=num_classes, normalizer=norm,
            act=act, ndim=self.ndim, name=name, **kw)
        ref1 = rb(2 * ngf, "refine1", start=True)([layer4], y, sdims(layer4))
        ref2 = rb(2 * ngf, "refine2")([layer3, ref1], y, sdims(layer3))
        ref3 = rb(ngf, "refine3")([layer2, ref2], y, sdims(layer2))
        output = rb(ngf, "refine4", end=True)([layer1, ref3], y,
                                              sdims(layer1))

        output = norm(num_features=ngf, num_classes=num_classes,
                      name="normalizer")(output, y)
        output = act(output)
        return Conv(features=cfg.data.channels, kernel_size=3,
                    ndim=self.ndim, name="end_conv")(output)


class NCSNdeeper(nn.Module):
    """5-stage NCSN v1 (reference: ncsn/models/ncsn.py:102-188)."""
    config: Any
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        num_classes = cfg.model.num_classes
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=True)
        y = y.astype(jnp.int32)

        h = x if centered_input(cfg) else 2 * x - 1

        def res(out_dim, resample=None, dilation=None, name=None):
            return ConditionalResidualBlock(
                output_dim=out_dim, normalization=norm,
                num_classes=num_classes, act=act, ndim=self.ndim,
                resample=resample, dilation=dilation, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=self.ndim,
                      name="begin_conv")(h)
        layer1 = res(ngf, name="res1_0")(output, y)
        layer1 = res(ngf, name="res1_1")(layer1, y)
        layer2 = res(2 * ngf, resample="down", name="res2_0")(layer1, y)
        layer2 = res(2 * ngf, name="res2_1")(layer2, y)
        layer3 = res(2 * ngf, resample="down", name="res3_0")(layer2, y)
        layer3 = res(2 * ngf, name="res3_1")(layer3, y)
        layer4 = res(4 * ngf, resample="down", dilation=2,
                     name="res4_0")(layer3, y)
        layer4 = res(4 * ngf, dilation=2, name="res4_1")(layer4, y)
        layer5 = res(4 * ngf, resample="down", dilation=4,
                     name="res5_0")(layer4, y)
        layer5 = res(4 * ngf, dilation=4, name="res5_1")(layer5, y)

        sdims = lambda t: t.shape[1:1 + self.ndim]
        rb = lambda feats, name, **kw: CondRefineBlock(
            features=feats, num_classes=num_classes, normalizer=norm,
            act=act, ndim=self.ndim, name=name, **kw)
        ref1 = rb(4 * ngf, "refine1", start=True)([layer5], y, sdims(layer5))
        ref2 = rb(2 * ngf, "refine2")([layer4, ref1], y, sdims(layer4))
        ref3 = rb(2 * ngf, "refine3")([layer3, ref2], y, sdims(layer3))
        ref4 = rb(ngf, "refine4")([layer2, ref3], y, sdims(layer2))
        output = rb(ngf, "refine5", end=True)([layer1, ref4], y,
                                              sdims(layer1))

        output = norm(num_features=ngf, num_classes=num_classes,
                      name="normalizer")(output, y)
        output = act(output)
        return Conv(features=cfg.data.channels, kernel_size=3,
                    ndim=self.ndim, name="end_conv")(output)
