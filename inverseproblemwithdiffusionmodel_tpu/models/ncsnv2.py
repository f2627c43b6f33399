"""NCSNv2 score networks (2D primary; rank-generic core reused for 1D).

Reference semantics: ncsn/models/ncsnv2.py (NCSNv2 :11-101, NCSNv2Deeper
:104-195, NCSNv2Deepest :198-299) and ncsn/models/ncsn1d.py. 4-6 residual
stages (dilations 1/1/2/4) + RefineNet decoder; input affine 2x-1 when data
is not rescaled (:76-79); output divided by the per-sample noise level
(:97-99).

TPU-first departures:
- channel-last NWC/NHWC layouts,
- the model takes `used_sigmas` (B,) noise VALUES rather than integer
  labels indexing a registered buffer - the sigma ladder lives in the
  sampler, which lets the 2D+time sampler re-ladder the temporal net
  without mutating model state (cf. ALD_optimizers.py:345 monkey-patching
  `scorenet_T.sigmas`).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from .layers import (Conv, ResidualBlock, RefineBlock, get_act,
                     centered_input)
from .normalization import get_normalization


def _divide_by_sigmas(out: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
    return out / used_sigmas.reshape(-1, *([1] * (out.ndim - 1)))


class NCSNv2(nn.Module):
    """4-stage NCSNv2 (reference: ncsn/models/ncsnv2.py:11-101)."""
    config: Any
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=False)
        channels = cfg.data.channels
        adjust = cfg.data.image_size == 28

        h = x if centered_input(cfg) else 2 * x - 1.0

        def res(out_dim, resample=None, dilation=None, adjust_padding=False,
                name=None):
            return ResidualBlock(output_dim=out_dim, normalization=norm,
                                 act=act, ndim=self.ndim, resample=resample,
                                 dilation=dilation,
                                 adjust_padding=adjust_padding, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=self.ndim,
                      name="begin_conv")(h)

        layer1 = res(ngf, name="res1_0")(output)
        layer1 = res(ngf, name="res1_1")(layer1)
        layer2 = res(2 * ngf, resample="down", name="res2_0")(layer1)
        layer2 = res(2 * ngf, name="res2_1")(layer2)
        layer3 = res(2 * ngf, resample="down", dilation=2, name="res3_0")(layer2)
        layer3 = res(2 * ngf, dilation=2, name="res3_1")(layer3)
        layer4 = res(2 * ngf, resample="down", dilation=4,
                     adjust_padding=adjust, name="res4_0")(layer3)
        layer4 = res(2 * ngf, dilation=4, name="res4_1")(layer4)

        sdims = lambda t: t.shape[1:1 + self.ndim]
        ref1 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                           start=True, name="refine1")([layer4], sdims(layer4))
        ref2 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                           name="refine2")([layer3, ref1], sdims(layer3))
        ref3 = RefineBlock(features=ngf, act=act, ndim=self.ndim,
                           name="refine3")([layer2, ref2], sdims(layer2))
        output = RefineBlock(features=ngf, act=act, ndim=self.ndim, end=True,
                             name="refine4")([layer1, ref3], sdims(layer1))

        output = norm(num_features=ngf, name="normalizer")(output)
        output = act(output)
        output = Conv(features=channels, kernel_size=3, ndim=self.ndim,
                      name="end_conv")(output)
        return _divide_by_sigmas(output, used_sigmas)


class NCSNv2Deeper(nn.Module):
    """5-stage NCSNv2 for 96-128 px (reference: ncsnv2.py:104-195)."""
    config: Any
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=False)
        channels = cfg.data.channels

        h = x if centered_input(cfg) else 2 * x - 1.0

        def res(out_dim, resample=None, dilation=None, name=None):
            return ResidualBlock(output_dim=out_dim, normalization=norm,
                                 act=act, ndim=self.ndim, resample=resample,
                                 dilation=dilation, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=self.ndim,
                      name="begin_conv")(h)

        layer1 = res(ngf, name="res1_0")(output)
        layer1 = res(ngf, name="res1_1")(layer1)
        layer2 = res(2 * ngf, resample="down", name="res2_0")(layer1)
        layer2 = res(2 * ngf, name="res2_1")(layer2)
        layer3 = res(2 * ngf, resample="down", name="res3_0")(layer2)
        layer3 = res(2 * ngf, name="res3_1")(layer3)
        layer4 = res(4 * ngf, resample="down", dilation=2, name="res4_0")(layer3)
        layer4 = res(4 * ngf, dilation=2, name="res4_1")(layer4)
        layer5 = res(4 * ngf, resample="down", dilation=4, name="res5_0")(layer4)
        layer5 = res(4 * ngf, dilation=4, name="res5_1")(layer5)

        sdims = lambda t: t.shape[1:1 + self.ndim]
        ref1 = RefineBlock(features=4 * ngf, act=act, ndim=self.ndim,
                           start=True, name="refine1")([layer5], sdims(layer5))
        ref2 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                           name="refine2")([layer4, ref1], sdims(layer4))
        ref3 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                           name="refine3")([layer3, ref2], sdims(layer3))
        ref4 = RefineBlock(features=ngf, act=act, ndim=self.ndim,
                           name="refine4")([layer2, ref3], sdims(layer2))
        output = RefineBlock(features=ngf, act=act, ndim=self.ndim, end=True,
                             name="refine5")([layer1, ref4], sdims(layer1))

        output = norm(num_features=ngf, name="normalizer")(output)
        output = act(output)
        output = Conv(features=channels, kernel_size=3, ndim=self.ndim,
                      name="end_conv")(output)
        return _divide_by_sigmas(output, used_sigmas)


class NCSNv2Deepest(nn.Module):
    """6-stage NCSNv2 for 256 px - the net `load_model` instantiates for
    "Diffusion" (reference: ncsnv2.py:198-299, helpers/load_model.py:24)."""
    config: Any
    ndim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=False)
        channels = cfg.data.channels

        h = x if centered_input(cfg) else 2 * x - 1.0

        def res(out_dim, resample=None, dilation=None, name=None):
            return ResidualBlock(output_dim=out_dim, normalization=norm,
                                 act=act, ndim=self.ndim, resample=resample,
                                 dilation=dilation, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=self.ndim,
                      name="begin_conv")(h)

        layer1 = res(ngf, name="res1_0")(output)
        layer1 = res(ngf, name="res1_1")(layer1)
        layer2 = res(2 * ngf, resample="down", name="res2_0")(layer1)
        layer2 = res(2 * ngf, name="res2_1")(layer2)
        layer3 = res(2 * ngf, resample="down", name="res3_0")(layer2)
        layer3 = res(2 * ngf, name="res3_1")(layer3)
        layer31 = res(2 * ngf, resample="down", name="res31_0")(layer3)
        layer31 = res(2 * ngf, name="res31_1")(layer31)
        layer4 = res(4 * ngf, resample="down", dilation=2, name="res4_0")(layer31)
        layer4 = res(4 * ngf, dilation=2, name="res4_1")(layer4)
        layer5 = res(4 * ngf, resample="down", dilation=4, name="res5_0")(layer4)
        layer5 = res(4 * ngf, dilation=4, name="res5_1")(layer5)

        sdims = lambda t: t.shape[1:1 + self.ndim]
        ref1 = RefineBlock(features=4 * ngf, act=act, ndim=self.ndim,
                           start=True, name="refine1")([layer5], sdims(layer5))
        ref2 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                           name="refine2")([layer4, ref1], sdims(layer4))
        ref31 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                            name="refine31")([layer31, ref2], sdims(layer31))
        ref3 = RefineBlock(features=2 * ngf, act=act, ndim=self.ndim,
                           name="refine3")([layer3, ref31], sdims(layer3))
        ref4 = RefineBlock(features=ngf, act=act, ndim=self.ndim,
                           name="refine4")([layer2, ref3], sdims(layer2))
        output = RefineBlock(features=ngf, act=act, ndim=self.ndim, end=True,
                             name="refine5")([layer1, ref4], sdims(layer1))

        output = norm(num_features=ngf, name="normalizer")(output)
        output = act(output)
        output = Conv(features=channels, kernel_size=3, ndim=self.ndim,
                      name="end_conv")(output)
        return _divide_by_sigmas(output, used_sigmas)
