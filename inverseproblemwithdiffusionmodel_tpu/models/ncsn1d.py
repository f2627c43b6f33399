"""1-D temporal score networks on pixel-tube signals (B, T, C).

Reference semantics: ncsn/models/ncsn1d.py - NCSN1D/Deeper/Deepest are the
NCSNv2 family with Conv1d; here they ARE the rank-generic NCSNv2 modules at
ndim=1 (one implementation, no 470-line copy). UNET1D (:14-36) wraps a plain
1-D UNet and divides by sigma.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .ncsnv2 import NCSNv2, NCSNv2Deeper, NCSNv2Deepest, _divide_by_sigmas
from .unet import UNet


def NCSN1D(config) -> NCSNv2:
    return NCSNv2(config=config, ndim=1)


def NCSN1DDeeper(config) -> NCSNv2Deeper:
    return NCSNv2Deeper(config=config, ndim=1)


def NCSN1DDeepest(config) -> NCSNv2Deepest:
    return NCSNv2Deepest(config=config, ndim=1)


class UNET1D(nn.Module):
    """1-D UNet score net / sigma (reference: ncsn1d.py:14-36; the MONAI
    UNet with channels [64, 256, 1024, 4196], strides (2,2,2), instance
    norm)."""
    config: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, used_sigmas: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        use_in = bool(cfg.training.get("use_IN", True)) if hasattr(
            cfg.training, "get") else True
        out = UNet(out_channels=cfg.data.channels,
                   features=(64, 256, 1024, 4196),
                   strides=(2, 2, 2),
                   ndim=1,
                   norm="instance" if use_in else None)(x)
        return _divide_by_sigmas(out, used_sigmas)
