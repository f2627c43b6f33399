"""Linear forward-operator protocol for inverse problems.

Reference semantics: ncsn/linear_transforms/__init__.py:6-33. Operators are
flax.struct pytree dataclasses: their array state (masks, coil maps) are
leaves, so an operator can be closed over by - or passed straight into -
jitted sampler scans and sharded over a mesh.

Conventions: images are channel-last complex64 (B, H, W, C);
measurements are operator-defined (e.g. SENSE stacks a coil axis in front).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class LinearTransform(struct.PyTreeNode):
    """A |-> A x with adjoint and optional k-space projection."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def conj_op(self, s: jnp.ndarray) -> jnp.ndarray:
        """Adjoint A^H s."""
        raise NotImplementedError

    def projection(self, x: jnp.ndarray, s: jnp.ndarray, lamda: float) -> jnp.ndarray:
        """Hard/soft data-consistency projection (operator specific)."""
        raise NotImplementedError

    def log_lh_grad(self, x: jnp.ndarray, s: jnp.ndarray,
                    lamda: float = 1.0) -> jnp.ndarray:
        """grad_x log p(s | x) = -lamda * A^H (A x - s)
        (reference: linear_transforms/__init__.py:26-33)."""
        return -self.conj_op(self(x) - s) * lamda
