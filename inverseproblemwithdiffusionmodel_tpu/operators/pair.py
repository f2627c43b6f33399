"""Real-pair forward operators and proximal solver (TPU fast path).

Mirrors operators/fourier.py + operators/proximal.py with complex arrays
replaced by (re, im) float32 pairs and the FFT replaced by the matmul DFT
(ops/fft_pair.py) — no complex dtype anywhere, so the whole reconstruction
runs on backends without complex support and rides the MXU on those with it.
Numerics are validated against the complex implementations in
tests/test_pair_ops.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops.fft_pair import i2k_pair, k2i_pair, cmul, cconj_mul

Pair = Tuple[jnp.ndarray, jnp.ndarray]


class PairSENSE(struct.PyTreeNode):
    """Multi-coil SENSE in pair form (cf. operators/fourier.py SENSE).

    mask: (1|T, 1, W, 1) float32; sens (num_sens, H, W, 1) as (re, im).
    Forward: (B, H, W, C) pair -> (num_sens, B, H, W, C) pair.
    """
    mask: jnp.ndarray
    sens_re: jnp.ndarray
    sens_im: jnp.ndarray

    def __call__(self, xr: jnp.ndarray, xi: jnp.ndarray) -> Pair:
        cr, ci = cmul(self.sens_re[:, None], self.sens_im[:, None],
                      xr[None], xi[None])
        kr, ki = i2k_pair(cr, ci)
        return self.mask * kr, self.mask * ki

    def conj_op(self, sr: jnp.ndarray, si: jnp.ndarray) -> Pair:
        ir, ii = k2i_pair(sr, si)
        rr, ri = cconj_mul(self.sens_re[:, None], self.sens_im[:, None],
                           ir, ii)
        return jnp.sum(rr, axis=0), jnp.sum(ri, axis=0)

    @classmethod
    def from_complex(cls, sense) -> "PairSENSE":
        """Build from an operators.fourier.SENSE instance."""
        sm = np.asarray(sense.sens_maps)
        return cls(mask=jnp.asarray(sense.base.mask),
                   sens_re=jnp.asarray(sm.real, jnp.float32),
                   sens_im=jnp.asarray(sm.imag, jnp.float32))


class PairRandomUndersamplingFourier(struct.PyTreeNode):
    """Single-coil masked DFT in pair form
    (cf. operators/fourier.py RandomUndersamplingFourier)."""
    mask: jnp.ndarray

    def __call__(self, xr, xi) -> Pair:
        kr, ki = i2k_pair(xr, xi)
        return self.mask * kr, self.mask * ki

    def conj_op(self, sr, si) -> Pair:
        return k2i_pair(sr, si)

    @classmethod
    def from_complex(cls, op) -> "PairRandomUndersamplingFourier":
        return cls(mask=jnp.asarray(op.mask))


def _pair_dot(ar, ai, br, bi) -> jnp.ndarray:
    """Re<a, b> summed over everything."""
    return jnp.sum(ar * br + ai * bi)


class PairL2Penalty(struct.PyTreeNode):
    """CG solve of (I + c A^H A) x = z + c A^H y on pairs
    (cf. operators/proximal.py L2Penalty)."""
    lin_tfm: PairSENSE
    num_iters: int = struct.field(pytree_node=False, default=8)

    def __call__(self, zr, zi, yr, yi, alpha, lamda) -> Pair:
        c = alpha / lamda
        ar, ai = self.lin_tfm.conj_op(yr, yi)
        br, bi = zr + c * ar, zi + c * ai

        def op(vr, vi):
            fr, fi = self.lin_tfm(vr, vi)
            gr, gi = self.lin_tfm.conj_op(fr, fi)
            return vr + c * gr, vi + c * gi

        # CG on the pair (a complex Hermitian system solved in R^2n)
        x = (zr, zi)
        opx = op(*x)
        r = (br - opx[0], bi - opx[1])
        p = r
        rs = _pair_dot(*r, *r)

        def body(_, state):
            x, r, p, rs = state
            Ap = op(*p)
            alpha_ = rs / jnp.maximum(_pair_dot(*p, *Ap), 1e-30)
            x = (x[0] + alpha_ * p[0], x[1] + alpha_ * p[1])
            r = (r[0] - alpha_ * Ap[0], r[1] - alpha_ * Ap[1])
            rs_new = _pair_dot(*r, *r)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = (r[0] + beta * p[0], r[1] + beta * p[1])
            return x, r, p, rs_new

        x, _, _, _ = jax.lax.fori_loop(0, self.num_iters, body, (x, r, p, rs))
        return x
