"""Data-consistency proximal operators.

All solve  x <- argmin_x 1/2 ||x - z||^2 + 1/2 * (alpha/lamda) ||A x - y||^2
whose normal equation is  (I + c A^H A) x = z + c A^H y,  c = alpha / lamda.

Reference semantics: ncsn/models/proximal_op.py. TPU-first departures:
- `L2Penalty` solves the normal equation exactly with conjugate gradients
  (a handful of FFT pairs, all inside the jitted sampler scan) instead of the
  reference's single SGD step on the quadratic (proximal_op.py:19-51); the
  reference behaviour is available as mode="sgd" for parity studies.
- `SingleCoil` keeps the closed form x = F' diag(1/(1+c M)) F (z + c F' y)
  (proximal_op.py:72-94), which on TPU is two fused FFTs.

Each operator exposes `check_solution` (the reference's in-situ verifier,
proximal_op.py:53-59,96-104) returning the normal-equation residual - these
are promoted to real unit tests in tests/test_proximal.py.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from .base import LinearTransform
from .fourier import RandomUndersamplingFourier, SENSE
from ..ops.fft import i2k_complex, k2i_complex


def _cdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Real part of the complex inner product <a, b>."""
    return jnp.sum(jnp.real(jnp.conj(a) * b))


def cg_solve(operator: Callable[[jnp.ndarray], jnp.ndarray], b: jnp.ndarray,
             x0: jnp.ndarray, num_iters: int) -> jnp.ndarray:
    """Conjugate gradients for Hermitian PSD `operator`. Fixed iteration
    count (static for XLA); eigenvalues of I + c A^H A lie in [1, 1+c] so a
    few iterations reach machine precision."""
    r0 = b - operator(x0)
    p0 = r0
    rs0 = _cdot(r0, r0)

    def body(_, state):
        x, r, p, rs = state
        Ap = operator(p)
        alpha = rs / jnp.maximum(_cdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = _cdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, num_iters, body, (x0, r0, p0, rs0))
    return x


class Proximal(struct.PyTreeNode):
    lin_tfm: LinearTransform

    def __call__(self, z: jnp.ndarray, y: jnp.ndarray, alpha: float,
                 lamda: float) -> jnp.ndarray:
        raise NotImplementedError

    def check_solution(self, x_sol: jnp.ndarray, z: jnp.ndarray, y: jnp.ndarray,
                       alpha: float, lamda: float) -> jnp.ndarray:
        """Mean squared normal-equation residual
        (reference: proximal_op.py:53-59)."""
        c = alpha / lamda
        lhs = x_sol + c * self.lin_tfm.conj_op(self.lin_tfm(x_sol))
        rhs = z + c * self.lin_tfm.conj_op(y)
        B = x_sol.shape[0]
        return jnp.mean(jnp.sum(jnp.abs(lhs - rhs).reshape(B, -1) ** 2, axis=-1))


class L2Penalty(Proximal):
    """CG solve of the prox normal equation (default), or the reference's
    single batch-mean SGD step (mode='sgd', proximal_op.py:19-51)."""
    num_iters: int = struct.field(pytree_node=False, default=8)
    mode: str = struct.field(pytree_node=False, default="cg")
    sgd_lr: float = struct.field(pytree_node=False, default=5e-2)

    def __call__(self, z, y, alpha, lamda):
        c = alpha / lamda
        if self.mode == "cg":
            b = z + c * self.lin_tfm.conj_op(y)
            op = lambda v: v + c * self.lin_tfm.conj_op(self.lin_tfm(v))
            return cg_solve(op, b, z, self.num_iters)
        elif self.mode == "sgd":
            # One SGD step at x=z on the batch-mean quadratic: the (x-z) term
            # vanishes, leaving z - lr/B * c * A^H (A z - y).
            B = z.shape[0]
            grad = c * self.lin_tfm.conj_op(self.lin_tfm(z) - y)
            return z - self.sgd_lr / B * grad
        raise ValueError(f"unknown L2Penalty mode {self.mode!r}")


class Constrained(Proximal):
    """Hard k-space replacement via the operator's projection
    (reference: proximal_op.py:62-69, Yang et al.)."""

    def __call__(self, z, y, alpha, lamda=None):
        # signature kept uniform; `alpha` plays the reference's lamda role
        return self.lin_tfm.projection(z, y, alpha)


class SingleCoil(Proximal):
    """Closed form for masked single-coil Fourier (orthonormal FFT):
    x = F' diag(1/(1 + c M)) F (z + c F' y)  (reference: proximal_op.py:72-94).
    """

    def __call__(self, z, y, alpha, lamda):
        c = alpha / lamda
        mask = self.lin_tfm.mask
        x = z + c * k2i_complex(y)
        k = i2k_complex(x)
        k = k / (1.0 + mask * c)
        return k2i_complex(k)


def get_proximal(name: str) -> type:
    """Name dispatch (reference: proximal_op.py:107-119)."""
    table = {"L2Penalty": L2Penalty, "Constrained": Constrained,
             "SingleCoil": SingleCoil}
    if name not in table:
        raise NotImplementedError(f"unknown proximal {name!r}")
    return table[name]
