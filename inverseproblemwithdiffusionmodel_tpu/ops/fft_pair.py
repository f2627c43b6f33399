"""Centered orthonormal 2-D DFT in real-pair form via MXU matmuls.

TPU-first fast path for the i2k/k2i FFT pair (ops/fft.py, reference
semantics ncsn/linear_transforms/__init__.py:36-57): complex64 on TPU is
software-emulated (and entirely unimplemented on some backends), while a
DFT of these sizes (<= 512) as two dense matmuls per axis rides the MXU at
full throughput. fftshift/ifftshift are baked into the DFT matrices as row/
column permutations, so

    i2k(x) = F_c x F_c^T   with   F_c = S_post F S_pre,

and k2i uses the conjugate transpose. Complex arrays are (re, im) pairs of
real float32 arrays; a complex matmul is 3 real matmuls (Karatsuba).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

Pair = Tuple[jnp.ndarray, jnp.ndarray]


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(real, imag) of the centered orthonormal (i)DFT matrix with the
    fftshift permutations folded in."""
    k = np.arange(n)
    sign = 2j if inverse else -2j
    F = np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    pre = np.fft.ifftshift(np.eye(n), axes=0)    # ifftshift of the input
    post = np.fft.fftshift(np.eye(n), axes=0)    # fftshift of the output
    Fc = post @ F @ pre
    return (np.ascontiguousarray(Fc.real.astype(np.float32)),
            np.ascontiguousarray(Fc.imag.astype(np.float32)))


def dft_matrix(n: int, inverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fr, fi = _dft_mats(n, inverse)
    return jnp.asarray(fr), jnp.asarray(fi)


def _cmat_apply(fr: jnp.ndarray, fi: jnp.ndarray, xr: jnp.ndarray,
                xi: jnp.ndarray, axis: int) -> Pair:
    """(fr + i fi) applied along `axis` of the pair (xr, xi) — Karatsuba:
    3 real contractions instead of 4."""
    def mat(m, v):
        return jnp.moveaxis(jnp.tensordot(m, v, axes=(1, axis)), 0, axis)

    t1 = mat(fr, xr)
    t2 = mat(fi, xi)
    t3 = mat(fr + fi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def i2k_pair(xr: jnp.ndarray, xi: jnp.ndarray,
             axes: Tuple[int, int] = (-3, -2)) -> Pair:
    """Centered orthonormal 2-D DFT of a real pair; default spatial axes
    (..., H, W, C) like ops.fft.i2k_complex."""
    for ax in axes:
        n = xr.shape[ax]
        fr, fi = dft_matrix(n, inverse=False)
        xr, xi = _cmat_apply(fr, fi, xr, xi, ax % xr.ndim)
    return xr, xi


def k2i_pair(kr: jnp.ndarray, ki: jnp.ndarray,
             axes: Tuple[int, int] = (-3, -2)) -> Pair:
    """Inverse of i2k_pair."""
    for ax in axes:
        n = kr.shape[ax]
        fr, fi = dft_matrix(n, inverse=True)
        kr, ki = _cmat_apply(fr, fi, kr, ki, ax % kr.ndim)
    return kr, ki


def cmul(ar, ai, br, bi) -> Pair:
    """(ar + i ai)(br + i bi) elementwise."""
    return ar * br - ai * bi, ar * bi + ai * br


def cconj_mul(ar, ai, br, bi) -> Pair:
    """conj(a) * b elementwise."""
    return ar * br + ai * bi, ar * bi - ai * br
