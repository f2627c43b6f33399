"""ALD loop variants: inpainting, interpolation, class-conditioned,
inverse-problem with normalized likelihood mixing, and the re-grown
classifier-guided inverse samplers.

Reference semantics: ncsn/models/__init__.py — `anneal_Langevin_dynamics`
(:41), `_inpainting` (:86), `_interpolation` (:118), `_cls_conditioned`
(:219), `_inverse_problem` (:269) and `_inverse_problem_proj` (:331).
The classifier-guided inverse samplers (`ald_inverse_clf*`) are re-grown
from `compute_clf_grad` (:172) and the proximal Re/Im pattern
(ALD_optimizers.py:161-327) — the reference's `ALDInvClf*` classes are
stale/deleted (scripts/mnist_inv_clf_sampling.py:18 imports a class that no
longer exists).

All loops are lax.scan over levels with fori_loop inner steps — one XLA
computation each, PRNG threaded explicitly.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .ald import (ALDConfig, ScoreFn, _labels, _langevin_update,
                  compute_clf_grad)
from ..operators.base import LinearTransform
from ..operators.proximal import Proximal
from ..utils.misc import stack_parts, unstack_parts


def _scan_levels(level_step, init, sigmas):
    L = sigmas.shape[0]
    carry, _ = lax.scan(level_step, init,
                        (jnp.arange(L, dtype=jnp.int32), jnp.asarray(sigmas)))
    return carry


def _denoise(score_fn: ScoreFn, x: jnp.ndarray, sigmas: jnp.ndarray
             ) -> jnp.ndarray:
    L = sigmas.shape[0]
    return x + sigmas[-1] ** 2 * score_fn(x, _labels(x, L - 1))


def ald_inpainting(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    refer_image: jnp.ndarray,
    known_mask: jnp.ndarray,
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    x_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mask-generalized inpainting ALD (reference: ncsn/models/__init__.py:86
    hardcodes "right half missing"; `known_mask` is 1 where pixels are
    observed). Each inner step re-injects sigma-noised known pixels.

    NOTE: the reference inpainting loop has NO final denoise branch
    (:86-117), unlike the unconditional sampler; config.denoise is
    therefore ignored here — pass denoise explicitly via a trailing
    `_denoise` call if you want one."""
    key, k_init = jax.random.split(key)
    x = jax.random.uniform(k_init, refer_image.shape) \
        if x_init is None else x_init
    known_mask = known_mask.astype(x.dtype)
    sigma_last = sigmas[-1]

    def level_step(carry, inp):
        x, key = carry
        c, sigma = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x, key = state
            key, k_ref, k_n = jax.random.split(key, 3)
            corrupted = refer_image + jax.random.normal(
                k_ref, refer_image.shape) * sigma
            x = known_mask * corrupted + (1.0 - known_mask) * x
            grad = score_fn(x, _labels(x, c))
            return _langevin_update(x, grad, step_size, k_n), key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        return (x, key), None

    (x, key) = _scan_levels(level_step, (x, key), sigmas)
    # no final denoise: the reference inpainting loop has none (:86-117)
    return x


def half_mask(shape: Tuple[int, ...], axis: int = -2) -> jnp.ndarray:
    """Known-left-half mask (the reference's fixed inpainting pattern)."""
    m = np.zeros(shape, np.float32)
    cols = shape[axis] // 2
    sl = [slice(None)] * len(shape)
    sl[axis] = slice(0, cols)
    m[tuple(sl)] = 1.0
    return jnp.asarray(m)


def ald_interpolation(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    x_init: jnp.ndarray,
    n_interpolations: int,
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
) -> jnp.ndarray:
    """Noise-interpolated ALD: each of the B rows spawns `n_interpolations`
    chains whose Langevin noise slerps between two draws
    (reference: ncsn/models/__init__.py:118-165). Returns
    (B * n_interpolations, ...)."""
    n_rows = x_init.shape[0]
    feat = x_init.shape[1:]
    x = jnp.repeat(x_init[:, None], n_interpolations, axis=1
                   ).reshape(-1, *feat)
    sigma_last = sigmas[-1]
    angles = jnp.linspace(0.0, np.pi / 2.0, n_interpolations)
    cosf = jnp.cos(angles).reshape(1, -1, *([1] * len(feat)))
    sinf = jnp.sin(angles).reshape(1, -1, *([1] * len(feat)))

    def level_step(carry, inp):
        x, key = carry
        c, sigma = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x, key = state
            key, kp, kq = jax.random.split(key, 3)
            grad = score_fn(x, _labels(x, c))
            noise_p = jax.random.normal(kp, (n_rows, *feat))
            noise_q = jax.random.normal(kq, (n_rows, *feat))
            noise = (noise_p[:, None] * cosf + noise_q[:, None] * sinf
                     ).reshape(-1, *feat)
            x = x + step_size * grad + noise * jnp.sqrt(step_size * 2.0)
            return x, key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        return (x, key), None

    (x, key) = _scan_levels(level_step, (x, key), sigmas)
    return x


def ald_cls_conditioned(
    score_fn: ScoreFn,
    clf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cls: jnp.ndarray,
    sigmas: jnp.ndarray,
    shape: Tuple[int, ...],
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    x_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Classifier-guided prior sampling: grad += d log p(cls | x) / dx
    (reference: ncsn/models/__init__.py:219-266). The classifier is frozen
    (pure fn), replacing the reference's freeze_model (:166)."""
    key, k_init = jax.random.split(key)
    x = jax.random.uniform(k_init, shape) if x_init is None else x_init
    sigma_last = sigmas[-1]

    def level_step(carry, inp):
        x, key = carry
        c, sigma = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x, key = state
            key, k_n = jax.random.split(key)
            grad = score_fn(x, _labels(x, c)) + compute_clf_grad(clf_fn, x, cls)
            return _langevin_update(x, grad, step_size, k_n), key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        return (x, key), None

    (x, key) = _scan_levels(level_step, (x, key), sigmas)
    if config.denoise:
        x = _denoise(score_fn, x, sigmas)
    return x


def ald_inverse_problem(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    lamdas: Union[float, jnp.ndarray],
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    x_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ALD with the likelihood gradient renormalized to the prior-score norm:
    grad += g_lh / ||g_lh|| * ||grad|| (reference:
    ncsn/models/__init__.py:269-328). Real-valued state."""
    key, k_init = jax.random.split(key)
    x = jax.random.uniform(k_init, jnp.real(lin_tfm.conj_op(measurement)).shape) \
        if x_init is None else x_init
    lamdas = jnp.broadcast_to(jnp.asarray(lamdas, jnp.float32),
                              sigmas.shape)
    sigma_last = sigmas[-1]

    def level_step(carry, inp):
        x, key = carry
        (c, sigma), lamda = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x, key = state
            key, k_n = jax.random.split(key)
            grad = score_fn(x, _labels(x, c))
            g_lh = jnp.real(lin_tfm.log_lh_grad(x.astype(jnp.complex64),
                                                measurement, lamda))
            g_norm = jnp.linalg.norm(grad)
            lh_norm = jnp.maximum(jnp.linalg.norm(g_lh), 1e-20)
            grad = grad + g_lh / lh_norm * g_norm
            return _langevin_update(x, grad, step_size, k_n), key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        return (x, key), None

    L = sigmas.shape[0]
    (x, key), _ = lax.scan(
        level_step, (x, key),
        ((jnp.arange(L, dtype=jnp.int32), jnp.asarray(sigmas)), lamdas))
    if config.denoise:
        x = _denoise(score_fn, x, sigmas)
    return x


def ald_inverse_problem_proj(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    lamdas: Union[float, jnp.ndarray],
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    x_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Projection variant: k-space replacement before each level's inner
    steps (reference: ncsn/models/__init__.py:331-393)."""
    key, k_init = jax.random.split(key)
    x0 = lin_tfm.conj_op(measurement)
    x = jax.random.uniform(k_init, x0.shape, jnp.float32).astype(jnp.complex64) \
        if x_init is None else x_init
    lamdas = jnp.broadcast_to(jnp.asarray(lamdas, jnp.float32), sigmas.shape)
    sigma_last = sigmas[-1]

    def level_step(carry, inp):
        x, key = carry
        (c, sigma), lamda = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2
        x = lin_tfm.projection(x, measurement, lamda)

        def inner(_, state):
            x, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(jnp.real(x), jnp.imag(x))
            grads = score_fn(stacked, _labels(stacked, c))
            g_re, g_im = unstack_parts(grads)
            x_re = _langevin_update(jnp.real(x), g_re, step_size, k_re)
            x_im = _langevin_update(jnp.imag(x), g_im, step_size, k_im)
            return x_re + 1j * x_im, key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        return (x, key), None

    L = sigmas.shape[0]
    (x, key), _ = lax.scan(
        level_step, (x, key),
        ((jnp.arange(L, dtype=jnp.int32), jnp.asarray(sigmas)), lamdas))
    if config.denoise:
        stacked = stack_parts(jnp.real(x), jnp.imag(x))
        grads = score_fn(stacked, _labels(stacked, L - 1))
        g_re, g_im = unstack_parts(grads)
        x = (jnp.real(x) + sigmas[-1] ** 2 * g_re) \
            + 1j * (jnp.imag(x) + sigmas[-1] ** 2 * g_im)
    return x


def ald_inverse_clf(
    score_fn: ScoreFn,
    clf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cls: jnp.ndarray,
    sigmas: jnp.ndarray,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    lamdas: Union[float, jnp.ndarray],
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    clf_lamda: float = 1.0,
) -> jnp.ndarray:
    """Re-grown `ALDInvClf`: class-conditional inverse sampling — prior score
    + classifier guidance + data-consistency gradient. Real-valued state
    initialized at A^H y."""
    x = jnp.real(lin_tfm.conj_op(measurement))
    lamdas = jnp.broadcast_to(jnp.asarray(lamdas, jnp.float32), sigmas.shape)
    sigma_last = sigmas[-1]

    def level_step(carry, inp):
        x, key = carry
        (c, sigma), lamda = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x, key = state
            key, k_n = jax.random.split(key)
            grad = score_fn(x, _labels(x, c))
            grad = grad + compute_clf_grad(clf_fn, x, cls) * clf_lamda
            g_lh = jnp.real(lin_tfm.log_lh_grad(x.astype(jnp.complex64),
                                                measurement, lamda))
            grad = grad + g_lh
            return _langevin_update(x, grad, step_size, k_n), key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        return (x, key), None

    L = sigmas.shape[0]
    (x, key), _ = lax.scan(
        level_step, (x, jax.random.fold_in(key, 0)),
        ((jnp.arange(L, dtype=jnp.int32), jnp.asarray(sigmas)), lamdas))
    if config.denoise:
        x = _denoise(score_fn, x, sigmas)
    return x


def ald_inverse_clf_proximal(
    score_fn: ScoreFn,
    clf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cls: jnp.ndarray,
    sigmas: jnp.ndarray,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    proximal: Proximal,
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    lr_scaled: float = 1.0,
    clf_lamda: float = 1.0,
    clf_start_time: Optional[float] = None,
    clf_step_type: str = "linear",
) -> jnp.ndarray:
    """Re-grown `ALDInvClfProximal`: classifier guidance + proximal data
    consistency on the Re/Im split (pattern of ALD_optimizers.py:161-327 with
    clf guidance instead of seg). Returns complex.

    clf_start_time=None (default) applies constant-strength guidance
    (grad * clf_lamda). A float enables the reference prox script's ramped
    form (mnist_inv_clf_prox_sampling.py:32-33): get_lh_weights(sigmas,
    clf_start_time, clf_step_type) scales the guidance per level, divided by
    sigma — the ALDInvSegProximalRealImag weighting (:272-286) with the clf
    gradient in place of the seg gradient."""
    from .sigmas import get_lh_weights
    x0 = lin_tfm.conj_op(measurement)
    x_re, x_im = jnp.real(x0), jnp.imag(x0)
    sigma_last = sigmas[-1]
    cls2 = stack_parts(cls, cls)
    ramped = clf_start_time is not None
    lh_weights = (get_lh_weights(sigmas, clf_start_time, clf_step_type)
                  if ramped else jnp.ones_like(jnp.asarray(sigmas)))

    def level_step(carry, inp):
        x_re, x_im, key = carry
        c, sigma = inp
        lh_w = lh_weights[c]
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x_re, x_im, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(x_re, x_im)
            grads = score_fn(stacked, _labels(stacked, c))
            g_clf = compute_clf_grad(clf_fn, stacked, cls2)
            if ramped:
                grads = grads + g_clf / sigma * (lh_w * clf_lamda)
            else:
                grads = grads + g_clf * clf_lamda
            g_re, g_im = unstack_parts(grads)
            x_re = _langevin_update(x_re, g_re, step_size, k_re)
            x_im = _langevin_update(x_im, g_im, step_size, k_im)
            z = proximal(x_re + 1j * x_im, measurement,
                         config.step_lr * lr_scaled, 1.0)
            return jnp.real(z), jnp.imag(z), key

        x_re, x_im, key = lax.fori_loop(0, config.n_steps_each, inner,
                                        (x_re, x_im, key))
        return (x_re, x_im, key), None

    (x_re, x_im, key) = _scan_levels(level_step, (x_re, x_im, key), sigmas)
    if config.denoise:
        stacked = stack_parts(x_re, x_im)
        grads = score_fn(stacked, _labels(stacked, sigmas.shape[0] - 1))
        g_re, g_im = unstack_parts(grads)
        x_re = x_re + sigmas[-1] ** 2 * g_re
        x_im = x_im + sigmas[-1] ** 2 * g_im
    return x_re + 1j * x_im
