"""3-D (2D + time) score networks on (B, kx, ky, T, C) tubes.

Reference semantics: ncsn/models/ncsn3d.py - NCSN3D (:14-120) is the
rank-generic NCSNv2 at ndim=3; NCSN3DShallow (:123-224) is a shallower
variant with asymmetric temporal down/up convs (kernel (1,1,4), stride
(1,1,2), :176-177). Inputs of rank 3 (B, T, kx*ky) are pixel tubes and are
reshaped to volumes (and back) like the reference's rearrange (:84,118).
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .layers import (Conv, ConvTranspose, ResidualBlock, RefineBlock,
                     get_act, centered_input)
from .ncsnv2 import _divide_by_sigmas
from .normalization import get_normalization


class NCSN3D(nn.Module):
    """Full-depth 3-D NCSNv2 (reference: ncsn3d.py:14-120): the 4-stage
    NCSNv2 body at ndim=3 with `config.data.channels_3d` input/output
    channels (:28-32) and the rank-3 pixel-tube rearrange (:84,118);
    `config.data.channels` stays kx*ky for the tube window."""
    config: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=False)
        channels_3d = cfg.data.get("channels_3d", 1)
        win = int(np.sqrt(cfg.data.channels))
        adjust = cfg.data.image_size == 28

        x_rank = x.ndim
        if x_rank == 3:  # pixel tubes (B, T, kx*ky)
            x = _tube_to_volume(x, win)

        h = x if centered_input(cfg) else 2 * x - 1.0

        def res(out_dim, resample=None, dilation=None, adjust_padding=False,
                name=None):
            return ResidualBlock(output_dim=out_dim, normalization=norm,
                                 act=act, ndim=3, resample=resample,
                                 dilation=dilation,
                                 adjust_padding=adjust_padding, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=3,
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

        sdims = lambda t: t.shape[1:4]
        ref1 = RefineBlock(features=2 * ngf, act=act, ndim=3, start=True,
                           name="refine1")([layer4], sdims(layer4))
        ref2 = RefineBlock(features=2 * ngf, act=act, ndim=3,
                           name="refine2")([layer3, ref1], sdims(layer3))
        ref3 = RefineBlock(features=ngf, act=act, ndim=3,
                           name="refine3")([layer2, ref2], sdims(layer2))
        output = RefineBlock(features=ngf, act=act, ndim=3, end=True,
                             name="refine4")([layer1, ref3], sdims(layer1))

        output = norm(num_features=ngf, name="normalizer")(output)
        output = act(output)
        output = Conv(features=channels_3d, kernel_size=3, ndim=3,
                      name="end_conv")(output)
        output = _divide_by_sigmas(output, used_sigmas)

        if x_rank == 3:
            output = _volume_to_tube(output)
        return output


def _tube_to_volume(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, T, kx*ky) -> (B, kx, ky, T, 1)."""
    B, T, C = x.shape
    x = x.reshape(B, T, win, win)
    return jnp.transpose(x, (0, 2, 3, 1))[..., None]


def _volume_to_tube(x: jnp.ndarray) -> jnp.ndarray:
    """(B, kx, ky, T, 1) -> (B, T, kx*ky)."""
    B, kx, ky, T, _ = x.shape
    x = jnp.transpose(x[..., 0], (0, 3, 1, 2))
    return x.reshape(B, T, kx * ky)


class NCSN3DShallow(nn.Module):
    """Shallow 2D+time score net - what `load_model` instantiates for
    "Diffusion3D" (reference: ncsn3d.py:123-224, helpers/load_model.py:26).
    """
    config: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.model.ngf
        act = get_act(cfg)
        norm = get_normalization(cfg, conditional=False)
        channels_3d = cfg.data.get("channels_3d", 1)
        win = int(np.sqrt(cfg.data.channels))

        x_rank = x.ndim
        if x_rank == 3:  # pixel tubes (B, T, kx*ky)
            x = _tube_to_volume(x, win)

        h = x if centered_input(cfg) else 2 * x - 1.0

        def res(out_dim, resample=None, dilation=None, name=None):
            return ResidualBlock(output_dim=out_dim, normalization=norm,
                                 act=act, ndim=3, resample=resample,
                                 dilation=dilation, name=name)

        output = Conv(features=ngf, kernel_size=3, ndim=3,
                      name="begin_conv")(h)

        layer1 = res(ngf, name="res1_0")(output)
        layer1 = res(ngf, name="res1_1")(layer1)           # (kx, ky, T)
        layer2 = res(2 * ngf, resample="down", dilation=2,
                     name="res3_0")(layer1)
        layer2 = res(2 * ngf, dilation=2, name="res3_1")(layer2)
        # temporal downsample: kernel (1,1,4), stride (1,1,2), pad (0,0,1)
        layer3 = TemporalDownConv(features=2 * ngf,
                                  name="conv_temporal_down")(layer2)
        layer4 = res(2 * ngf, resample="down", dilation=4,
                     name="res4_0")(layer3)
        layer4 = res(2 * ngf, dilation=4, name="res4_1")(layer4)

        sdims = lambda t: t.shape[1:4]
        ref1 = RefineBlock(features=2 * ngf, act=act, ndim=3, start=True,
                           name="refine1")([layer4], sdims(layer4))
        ref2 = RefineBlock(features=2 * ngf, act=act, ndim=3,
                           name="refine2")([layer3, ref1], sdims(layer3))
        ref3 = ConvTranspose(features=ngf, kernel_size=(1, 1, 4),
                             stride=(1, 1, 2), padding=(0, 0, 1), ndim=3,
                             name="conv_temporal_up")(ref2)
        # NOTE: the reference's last 3D refine block is NOT marked end=True
        # (ncsn/models/ncsn3d.py:174 passes the default), so its output RCU
        # has 1 block, unlike the 2D nets' 3-block end RCU. Matched here so
        # reference-trained checkpoints import exactly.
        output = RefineBlock(features=ngf, act=act, ndim=3,
                             name="refine3")([layer1, ref3], sdims(layer1))

        output = norm(num_features=ngf, name="normalizer")(output)
        output = act(output)
        output = Conv(features=channels_3d, kernel_size=3, ndim=3,
                      name="end_conv")(output)
        output = _divide_by_sigmas(output, used_sigmas)

        if x_rank == 3:
            output = _volume_to_tube(output)
        return output


class TemporalDownConv(nn.Module):
    """Conv3d kernel (1,1,4), stride (1,1,2), padding (0,0,1) - halves the
    temporal axis only (reference: ncsn3d.py:176)."""
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import math
        import jax
        from jax import lax
        kernel_shape = (1, 1, 4, x.shape[-1], self.features)
        fan_in = int(np.prod(kernel_shape[:-1]))
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            kernel_shape)
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (self.features,))
        out = lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 2),
            padding=((0, 0), (0, 0), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + bias
