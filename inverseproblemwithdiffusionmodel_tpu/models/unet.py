"""Generic encoder-decoder UNet (MONAI-UNet equivalent), rank-generic.

Replaces the reference's MONAI dependency (helpers/load_model.py:28-31 Seg
UNet with channels [64,128,256,512,1024], strides [2,2,2,2];
ncsn/models/ncsn1d.py:20-28 UNET1D). Structure mirrors MONAI's
num_res_units=0 UNet: strided conv encoder, transposed-conv decoder with
skip concatenation, PReLU activations, optional instance norm.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv, ConvTranspose
from .normalization import _instance_norm


class PReLU(nn.Module):
    """Channel-shared PReLU (MONAI/torch default: single learned slope 0.25)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


class UNet(nn.Module):
    out_channels: int
    features: Sequence[int] = (64, 128, 256, 512, 1024)
    strides: Sequence[int] = (2, 2, 2, 2)
    ndim: int = 2
    norm: Optional[str] = "instance"
    kernel_size: int = 3

    def _act_norm(self, h, idx):
        if self.norm == "instance":
            h = _instance_norm(h)
        h = PReLU(name=f"prelu_{idx}")(h)
        return h

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert len(self.features) == len(self.strides) + 1
        skips = []
        h = x
        # encoder: strided convs
        for i, (f, s) in enumerate(zip(self.features[:-1], self.strides)):
            h = Conv(features=f, kernel_size=self.kernel_size, ndim=self.ndim,
                     stride=s, name=f"down_{i}")(h)
            h = self._act_norm(h, f"down_{i}")
            skips.append(h)
        # bottom
        h = Conv(features=self.features[-1], kernel_size=self.kernel_size,
                 ndim=self.ndim, name="bottom")(h)
        h = self._act_norm(h, "bottom")
        # decoder: transposed convs + skip concat
        for i, (f, s) in enumerate(
                zip(reversed(self.features[:-1]), reversed(self.strides))):
            is_last = i == len(self.strides) - 1
            out_f = self.out_channels if is_last else f
            h = jnp.concatenate([h, skips[-(i + 1)]], axis=-1)
            h = ConvTranspose(features=out_f,
                              kernel_size=(self.kernel_size,) * self.ndim,
                              stride=(s,) * self.ndim,
                              padding=(self.kernel_size // 2,) * self.ndim,
                              output_padding=(s - 1,) * self.ndim,
                              ndim=self.ndim, name=f"up_{i}")(h)
            if not is_last:
                h = self._act_norm(h, f"up_{i}")
        return h
