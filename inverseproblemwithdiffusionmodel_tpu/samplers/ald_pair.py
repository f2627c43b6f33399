"""Pair-native ALD reconstruction (no complex dtype anywhere).

Same semantics as samplers.ald.ald_inverse_seg_proximal_real_imag
(reference: ALD_optimizers.py:161-327) but with the measurement, operators,
and proximal step in (re, im) float32 pair form (operators/pair.py) — the
whole chain runs on TPU backends without complex support and maps the DFTs
onto the MXU. Numerics match the complex sampler (tests/test_pair_ops.py).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .ald import ALDConfig, ScoreFn, _labels, _langevin_update
from .sigmas import get_lh_weights
from ..utils.misc import stack_parts, unstack_parts


def ald_inverse_proximal_pair(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    measurement: Tuple[jnp.ndarray, jnp.ndarray],
    lin_tfm,
    proximal,
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    lr_scaled: float = 1.0,
    seg_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    seg_label: Optional[jnp.ndarray] = None,
    seg_lamda: float = 1.0,
    seg_start_time: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """measurement: (yr, yi). Returns the reconstruction pair (xr, xi)."""
    yr, yi = measurement
    x_re, x_im = lin_tfm.conj_op(yr, yi)
    sigma_last = sigmas[-1]
    L = sigmas.shape[0]
    lh_weights = get_lh_weights(sigmas, seg_start_time, "linear")
    use_seg = seg_fn is not None
    if use_seg:
        from .ald import compute_seg_grad
        seg_label2 = stack_parts(seg_label, seg_label)

    def level_step(carry, inp):
        x_re, x_im, key = carry
        c, sigma, lh_w = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x_re, x_im, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(x_re, x_im)
            grads = score_fn(stacked, _labels(stacked, c))
            if use_seg:
                from .ald import compute_seg_grad
                g_seg = compute_seg_grad(seg_fn, stacked, seg_label2)
                grads = grads + g_seg / sigma * (lh_w * seg_lamda)
            g_re, g_im = unstack_parts(grads)
            x_re = _langevin_update(x_re, g_re, step_size, k_re)
            x_im = _langevin_update(x_im, g_im, step_size, k_im)
            x_re, x_im = proximal(x_re, x_im, yr, yi,
                                  config.step_lr * lr_scaled, 1.0)
            return x_re, x_im, key

        x_re, x_im, key = lax.fori_loop(0, config.n_steps_each, inner,
                                        (x_re, x_im, key))
        return (x_re, x_im, key), None

    (x_re, x_im, key), _ = lax.scan(
        level_step, (x_re, x_im, key),
        (jnp.arange(L, dtype=jnp.int32), jnp.asarray(sigmas), lh_weights))

    if config.denoise:
        stacked = stack_parts(x_re, x_im)
        grads = score_fn(stacked, _labels(stacked, L - 1))
        g_re, g_im = unstack_parts(grads)
        x_re = x_re + sigma_last ** 2 * g_re
        x_im = x_im + sigma_last ** 2 * g_im
    return x_re, x_im


def make_stepped_pair_reconstructor(module, sigmas: jnp.ndarray, lin_tfm,
                                    proximal,
                                    config: ALDConfig = ALDConfig(),
                                    lr_scaled: float = 1.0):
    """Host-scheduled variant: one jitted sigma-LEVEL step (compiles like a
    single forward) looped over levels on the host with async dispatch.

    Numerically identical to `ald_inverse_proximal_pair`; use it where a
    whole-chain `lax.scan` program is impractical to compile (e.g. the axon
    remote-compile service rejects large programs). Returns
    `recon(params, yr, yi, key) -> (xr, xi)`.
    """
    sigmas = jnp.asarray(sigmas)
    sigma_last = sigmas[-1]
    L = int(sigmas.shape[0])

    @jax.jit
    def level_step(params, xr, xi, yr, yi, c, sigma, key):
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            xr, xi, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(xr, xi)
            grads = score_fn(stacked, _labels(stacked, c))
            g_re, g_im = unstack_parts(grads)
            xr = _langevin_update(xr, g_re, step_size, k_re)
            xi = _langevin_update(xi, g_im, step_size, k_im)
            xr, xi = proximal(xr, xi, yr, yi,
                              config.step_lr * lr_scaled, 1.0)
            return xr, xi, key

        return jax.lax.fori_loop(0, config.n_steps_each, inner,
                                 (xr, xi, key))

    @jax.jit
    def denoise(params, xr, xi):
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        stacked = stack_parts(xr, xi)
        grads = score_fn(stacked, _labels(stacked, L - 1))
        g_re, g_im = unstack_parts(grads)
        return xr + sigma_last ** 2 * g_re, xi + sigma_last ** 2 * g_im

    def recon(params, yr, yi, key):
        xr, xi = lin_tfm.conj_op(yr, yi)
        for c in range(L):
            xr, xi, key = level_step(params, xr, xi, yr, yi,
                                     jnp.int32(c), sigmas[c], key)
        if config.denoise:
            xr, xi = denoise(params, xr, xi)
        return xr, xi

    return recon
