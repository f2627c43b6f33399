"""Row-decimation operator (inpainting-style line skipping).

Reference semantics: ncsn/linear_transforms/masking.py:6-44 (`SkipLines`):
A = P * M keeps every `num_skip_lines`-th row; the adjoint zero-pads.
Channel-last (B, H, W, C); rows are axis 1.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .base import LinearTransform


class SkipLines(LinearTransform):
    num_skip_lines: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[:, 0::self.num_skip_lines, :, :]

    def conj_op(self, s: jnp.ndarray) -> jnp.ndarray:
        out_shape = (s.shape[0], self.height) + s.shape[2:]
        out = jnp.zeros(out_shape, dtype=s.dtype)
        return out.at[:, 0::self.num_skip_lines].set(s)

    def projection(self, x: jnp.ndarray, s: jnp.ndarray, lamda: float) -> jnp.ndarray:
        """Kept rows <- lamda * s + (1 - lamda) * A x; skipped rows unchanged
        (reference: masking.py:30-44)."""
        mixed = lamda * s + (1.0 - lamda) * self(x)
        return x.at[:, 0::self.num_skip_lines].set(mixed)
