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


def line_mask_normal_kernel(mask) -> Pair:
    """Precomputed normal-equation kernel K = F_c^H diag(m) F_c for a
    Cartesian line mask (constant along H, shape (M0, 1, W, 1)).

    Because the mask only depends on the W (readout-line) index, the H-axis
    DFTs cancel in A^H A = F^H M F: the whole masked-Fourier normal operator
    collapses to ONE W x W Hermitian matrix applied along the W axis — a
    single MXU matmul per CG iteration instead of two full DFT round trips
    (4 matmul-axis applications). Returns (Kr, Ki) of shape (M0, W, W).
    """
    import numpy as np
    from ..ops.fft_pair import _dft_mats

    m = np.asarray(mask, np.float32)
    if m.ndim != 4 or m.shape[1] != 1 or m.shape[-1] != 1:
        raise ValueError(f"expected a line mask of shape (M0,1,W,1), "
                         f"got {m.shape}")
    W = m.shape[2]
    fr, fi = _dft_mats(W, inverse=False)
    Fc = fr.astype(np.complex64) + 1j * fi.astype(np.complex64)
    # diag(m), not diag(m^2): the pair operators' conj_op deliberately
    # skips re-applying the mask (measurements live on the mask support,
    # like the reference SkipLines zero-pad adjoint), so the CG normal
    # operator this kernel replaces is conj_op(forward(.)) = F^H diag(m) F
    # for ANY real mask — the two paths agree by construction
    lines = m[:, 0, :, 0]                                   # (M0, W)
    K = np.einsum("vw,mv,vu->mwu", Fc.conj(), lines, Fc)    # F^H diag(m) F
    return (jnp.asarray(K.real.astype(np.float32)),
            jnp.asarray(K.imag.astype(np.float32)))


def _apply_line_kernel(kr: jnp.ndarray, ki: jnp.ndarray,
                       xr: jnp.ndarray, xi: jnp.ndarray) -> Pair:
    """Apply the (M0, W, W) complex kernel along the W axis of an
    (..., N, H, W, C) pair. M0 == 1 broadcasts; M0 == N is per-row (e.g.
    per-frame cine masks tiled to the chain axis); M0 | N repeats the
    kernel cyclically (a T-frame kernel over a B*T chain axis — B-way
    smaller than materializing B identical copies). Karatsuba: 3 real
    contractions."""
    if kr.shape[0] == 1:
        def mat(m, v):
            return jnp.moveaxis(jnp.tensordot(m, v, axes=(1, v.ndim - 2)),
                                0, v.ndim - 2)
        kr2, ki2 = kr[0], ki[0]
    else:
        def mat(m, v):
            M0, N = m.shape[0], v.shape[-4]
            if N == M0:
                return jnp.einsum("nwv,...nhvc->...nhwc", m, v)
            vb = v.reshape(v.shape[:-4] + (N // M0, M0) + v.shape[-3:])
            out = jnp.einsum("nwv,...bnhvc->...bnhwc", m, vb)
            return out.reshape(v.shape)
        kr2, ki2 = kr, ki
    t1 = mat(kr2, xr)
    t2 = mat(ki2, xi)
    t3 = mat(kr2 + ki2, xr + xi)
    return t1 - t2, t3 - t1 - t2


class PairL2Penalty(struct.PyTreeNode):
    """CG solve of (I + c A^H A) x = z + c A^H y on pairs
    (cf. operators/proximal.py L2Penalty).

    `kernel_re/kernel_im` (see `with_normal_kernel`) switch A^H A to the
    precomputed line-mask normal kernel (one matmul per coil per CG
    iteration instead of two DFT round trips); `ahy_re/ahy_im` pin a
    precomputed A^H y (loop-invariant across a sampling chain — hoist it
    out of the hot loop). Both are opt-in; the default path is the direct
    operator composition."""
    lin_tfm: PairSENSE
    num_iters: int = struct.field(pytree_node=False, default=8)
    kernel_re: Optional[jnp.ndarray] = None
    kernel_im: Optional[jnp.ndarray] = None
    ahy_re: Optional[jnp.ndarray] = None
    ahy_im: Optional[jnp.ndarray] = None

    @classmethod
    def with_normal_kernel(cls, lin_tfm, num_iters: int = 8,
                           measurement: Optional[Pair] = None
                           ) -> "PairL2Penalty":
        """Fast path: precompute the W x W normal kernel from the line mask
        (valid for any mask constant along H — every Cartesian mask here)
        and, when the fixed `measurement` (yr, yi) is known up front, the
        loop-invariant A^H y."""
        mask = np.asarray(lin_tfm.mask)
        # collapse cyclic repetition (chain ensembles tile a T-frame mask
        # to B*T rows): keep one (T, W, W) kernel, _apply_line_kernel
        # repeats it — B x less HBM at e.g. B=16 chains x 256^2
        M0 = mask.shape[0]
        for p in range(1, M0 + 1):
            if M0 % p == 0 and np.array_equal(
                    mask, np.tile(mask[:p], (M0 // p, 1, 1, 1))):
                mask = mask[:p]
                break
        kr, ki = line_mask_normal_kernel(mask)
        ahy_r = ahy_i = None
        if measurement is not None:
            ahy_r, ahy_i = lin_tfm.conj_op(*measurement)
        return cls(lin_tfm=lin_tfm, num_iters=num_iters,
                   kernel_re=kr, kernel_im=ki, ahy_re=ahy_r, ahy_im=ahy_i)

    def _normal(self, vr, vi) -> Pair:
        """A^H A v via the precomputed line-mask kernel."""
        lin = self.lin_tfm
        if hasattr(lin, "sens_re"):                          # SENSE
            cr, ci = cmul(lin.sens_re[:, None], lin.sens_im[:, None],
                          vr[None], vi[None])
            kr, ki = _apply_line_kernel(self.kernel_re, self.kernel_im,
                                        cr, ci)
            rr, ri = cconj_mul(lin.sens_re[:, None], lin.sens_im[:, None],
                               kr, ki)
            return jnp.sum(rr, axis=0), jnp.sum(ri, axis=0)
        return _apply_line_kernel(self.kernel_re, self.kernel_im, vr, vi)

    def __call__(self, zr, zi, yr, yi, alpha, lamda) -> Pair:
        c = alpha / lamda
        if self.ahy_re is not None:
            ar, ai = self.ahy_re, self.ahy_im
        else:
            ar, ai = self.lin_tfm.conj_op(yr, yi)
        br, bi = zr + c * ar, zi + c * ai

        if self.kernel_re is not None:
            def op(vr, vi):
                nr, ni = self._normal(vr, vi)
                return vr + c * nr, vi + c * ni
        else:
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
