"""Circular forward finite differences + anisotropic-TV subgradient.

Reference semantics: ncsn/linear_transforms/finite_diff.py:7-35. Used as the
"tv" temporal prior in the 2D+time samplers.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from flax import struct

from .base import LinearTransform


class FiniteDiff(LinearTransform):
    dims: Union[int, Tuple[int, ...]] = struct.field(pytree_node=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.roll(x, -1, self.dims) - x

    def conj_op(self, s: jnp.ndarray) -> jnp.ndarray:
        return jnp.roll(s, 1, self.dims) - s

    def log_lh_grad(self, x: jnp.ndarray, s: jnp.ndarray = None,
                    lamda: float = 1.0) -> jnp.ndarray:
        """Anisotropic-TV subgradient: -lamda * nabla' sign(nabla x)
        (reference: finite_diff.py:29-35)."""
        return -lamda * self.conj_op(jnp.sign(self(x)))

    def tv_norm(self, x: jnp.ndarray) -> jnp.ndarray:
        """Anisotropic total variation sum |nabla x| per batch element."""
        d = self(x)
        return jnp.sum(jnp.abs(d).reshape(x.shape[0], -1), axis=-1)
