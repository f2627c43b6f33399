"""Pluggable regularizers for MAP-style reconstructions.

Public-surface parity with the reference's `ncsn.regularizers`
(reference: ncsn/regularizers/__init__.py:4-15 — `AbstractRegularizer`,
`ZeroReg`), extended with the TV regularizer the reference builds ad hoc
from `kornia.losses.TotalVariation` in its TV baselines
(reference: scripts/acdc_SENSE_TV.py:16,78; helpers/pl_helpers.py:402-442).

Regularizers are pure callables on JAX arrays (jit/grad-safe): called with a
complex image, or with an (re, im) pair — returning the scalar penalty.
`samplers.map_opt.tv_reconstruction` routes its TV term through
`TVRegularizer` so custom penalties plug in via the `regularizer=` argument.
"""
from __future__ import annotations

import abc
from typing import Tuple

import jax.numpy as jnp


class AbstractRegularizer(abc.ABC):
    """A scalar penalty R(x) added to a data-consistency objective
    (reference: ncsn/regularizers/__init__.py:4-11)."""

    @abc.abstractmethod
    def __call__(self, *args, **kwargs):
        ...

    def pair(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        """Evaluate on an (re, im) pair — the TPU fast-path layout (no
        complex dtype; see operators/pair.py). Default: complexify."""
        return self(re + 1j * im)


class ZeroReg(AbstractRegularizer):
    """No regularization (reference: ncsn/regularizers/__init__.py:13-15)."""

    def __call__(self, *args, **kwargs):
        return 0.0

    def pair(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(0.0, dtype=re.dtype)


class TVRegularizer(AbstractRegularizer):
    """Anisotropic complex-modulus total variation with open boundaries —
    the penalty behind the reference's TV baselines (kornia
    TotalVariation on a complex parameter, scripts/acdc_SENSE_TV.py:16).

    weight scales the penalty; spatial_axes index H, W of the batched
    image layout (default channel-last (B, H, W, C))."""

    def __init__(self, weight: float = 1.0,
                 spatial_axes: Tuple[int, int] = (1, 2)):
        self.weight = weight
        self.spatial_axes = spatial_axes

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..samplers.map_opt import tv_norm_noncircular
        return self.weight * tv_norm_noncircular(x, self.spatial_axes)

    def pair(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        from ..samplers.map_opt import tv_norm_noncircular_pair
        return self.weight * tv_norm_noncircular_pair(re, im,
                                                      self.spatial_axes)


__all__ = ["AbstractRegularizer", "ZeroReg", "TVRegularizer"]
