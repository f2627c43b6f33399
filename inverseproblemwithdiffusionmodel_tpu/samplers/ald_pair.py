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

from .ald import (ALDConfig, ScoreFn, _labels, _langevin_update,
                  _maybe_snapshot)
from .sigmas import get_lh_weights
from ..utils.misc import stack_parts, unstack_parts


def _bake_ahy(proximal, ahy_r: jnp.ndarray, ahy_i: jnp.ndarray):
    """Pin the loop-invariant A^H y into a PairL2Penalty so the CG setup
    reuses it instead of recomputing a full SENSE adjoint every inner step.
    The samplers already compute A^H y once as the chain init — rebaking it
    here (a pytree `.replace`, traced values welcome) makes the hoist
    explicit rather than relying on XLA's loop-invariant code motion."""
    from ..operators.pair import PairL2Penalty
    if isinstance(proximal, PairL2Penalty) and proximal.ahy_re is None:
        return proximal.replace(ahy_re=ahy_r, ahy_im=ahy_i)
    return proximal


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
    seg_step_type: str = "linear",
    seg_mode: str = "full",
    snapshot_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """measurement: (yr, yi). Returns the reconstruction pair (xr, xi).
    `lr_scaled` may be a scalar or a PER-LEVEL (L,) schedule (annealed
    data-consistency weight), matching make_stepped_pair_reconstructor —
    the schedule rides the scan xs so either form stays one program.
    snapshot_fn(level, sigma, x_re, x_im): optional host diagnostics every
    config.snapshot_every levels (see ald._maybe_snapshot)."""
    yr, yi = measurement
    x_re, x_im = lin_tfm.conj_op(yr, yi)
    proximal = _bake_ahy(proximal, x_re, x_im)
    sigma_last = sigmas[-1]
    L = sigmas.shape[0]
    lr_sched = jnp.broadcast_to(
        jnp.asarray(lr_scaled, jnp.float32).reshape(-1), (L,))
    lh_weights = get_lh_weights(sigmas, seg_start_time, seg_step_type)
    use_seg = seg_fn is not None
    if use_seg:
        from .ald import compute_seg_grad
        assert seg_label is not None, "seg_fn given but seg_label is None"
        seg_label2 = stack_parts(seg_label, seg_label)

    def level_step(carry, inp):
        x_re, x_im, key = carry
        c, sigma, lh_w, lr_sc = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x_re, x_im, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(x_re, x_im)
            grads = score_fn(stacked, _labels(stacked, c))
            if use_seg:
                g_seg = compute_seg_grad(seg_fn, stacked, seg_label2,
                                         seg_mode)
                grads = grads + g_seg / sigma * (lh_w * seg_lamda)
            g_re, g_im = unstack_parts(grads)
            x_re = _langevin_update(x_re, g_re, step_size, k_re)
            x_im = _langevin_update(x_im, g_im, step_size, k_im)
            x_re, x_im = proximal(x_re, x_im, yr, yi,
                                  config.step_lr * lr_sc, 1.0)
            return x_re, x_im, key

        x_re, x_im, key = lax.fori_loop(0, config.n_steps_each, inner,
                                        (x_re, x_im, key))
        _maybe_snapshot(snapshot_fn, config, c, sigma, x_re, x_im)
        return (x_re, x_im, key), None

    (x_re, x_im, key), _ = lax.scan(
        level_step, (x_re, x_im, key),
        (jnp.arange(L, dtype=jnp.int32), jnp.asarray(sigmas), lh_weights,
         lr_sched))

    if config.denoise:
        stacked = stack_parts(x_re, x_im)
        grads = score_fn(stacked, _labels(stacked, L - 1))
        g_re, g_im = unstack_parts(grads)
        x_re = x_re + sigma_last ** 2 * g_re
        x_im = x_im + sigma_last ** 2 * g_im
    return x_re, x_im


def _pair_2d_time_inner(score_S, score_T, proximal, finite_diff, config,
                        mode_T: str, if_random_shift: bool, win_size: int,
                        sigma_last, sigma_T_last):
    """One 2D+time micro-step on (B, T, H, W, C) pairs — spatial score,
    temporal score/TV, proximal — shared by the scanned `ald_2d_time_pair`
    and the host-stepped reconstructor so the two variants are the same
    code by construction (reference semantics: ALD_optimizers.py:428-554).

    Returns inner(xr, xi, yr, yi, c, label_T, sigma, sigma_T, lr_scaled,
    lamda_T, key) -> (xr, xi, key). `c` indexes the (possibly swapped)
    spatial ladder; `label_T` indexes score_T's RAW temporal ladder."""
    from ..utils.reshape import apply_in_tube_space

    skip_spatial = mode_T in ("diffusion1d-only", "tv-only")
    use_temporal_diffusion = "diffusion1d" in mode_T
    use_tv = "tv" in mode_T

    def spatial_step(xr, xi, c, sigma, key):
        if skip_spatial:
            return xr, xi
        B, T, H, W, C = xr.shape
        step_size = config.step_lr * (sigma / sigma_last) ** 2
        fr = xr.reshape(B * T, H, W, C)
        fi = xi.reshape(B * T, H, W, C)
        stacked = stack_parts(fr, fi)
        grads = score_S(stacked, _labels(stacked, c))
        g_re, g_im = unstack_parts(grads)
        k_re, k_im = jax.random.split(key)
        fr = _langevin_update(fr, g_re, step_size, k_re)
        fi = _langevin_update(fi, g_im, step_size, k_im)
        return fr.reshape(B, T, H, W, C), fi.reshape(B, T, H, W, C)

    def temporal_step(xr, xi, label_T, sigma_T, lamda_T, key):
        if use_tv:
            xr = xr + finite_diff.log_lh_grad(xr, lamda=lamda_T)
            xi = xi + finite_diff.log_lh_grad(xi, lamda=lamda_T)
            return xr, xi
        if not use_temporal_diffusion:
            return xr, xi

        def do_step(args):
            xr, xi = args
            key_shift, key_re, key_im = jax.random.split(key, 3)
            step_size = (config.step_lr * (sigma_T / sigma_T_last) ** 2) \
                * lamda_T

            def tube_update(tr, ti):  # (B', T, k^2) pairs
                stacked = stack_parts(tr, ti)
                grads = score_T(stacked, _labels(stacked, label_T))
                g_re, g_im = unstack_parts(grads)
                return (_langevin_update(tr, g_re, step_size, key_re),
                        _langevin_update(ti, g_im, step_size, key_im))

            return apply_in_tube_space(tube_update, (xr, xi), win_size,
                                       key=key_shift,
                                       if_random_shift=if_random_shift)

        return lax.cond(sigma_T > 0, do_step, lambda a: a, (xr, xi))

    def proximal_step(xr, xi, yr, yi, lr_scaled):
        B, T, H, W, C = xr.shape
        fr = xr.reshape(B * T, H, W, C)
        fi = xi.reshape(B * T, H, W, C)
        fr, fi = proximal(fr, fi, yr, yi, config.step_lr * lr_scaled, 1.0)
        return fr.reshape(B, T, H, W, C), fi.reshape(B, T, H, W, C)

    def inner(xr, xi, yr, yi, c, label_T, sigma, sigma_T, lr_scaled,
              lamda_T, key):
        key, k_s, k_t = jax.random.split(key, 3)
        xr, xi = spatial_step(xr, xi, c, sigma, k_s)
        xr, xi = temporal_step(xr, xi, label_T, sigma_T, lamda_T, k_t)
        xr, xi = proximal_step(xr, xi, yr, yi, lr_scaled)
        return xr, xi, key

    return inner


def ald_2d_time_pair(
    score_fn_S: ScoreFn,
    score_fn_T: Optional[ScoreFn],
    sigmas: jnp.ndarray,
    sigmas_T: jnp.ndarray,
    measurement: Tuple[jnp.ndarray, jnp.ndarray],
    lin_tfm,
    proximal,
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    lr_scaled: float = 1.0,
    mode_T: str = "diffusion1d",
    lamda_T: float = 1.0,
    if_random_shift: bool = False,
    win_size: int = 8,
    num_frames: Optional[int] = None,
    snapshot_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pair-form factorized 2D+time reconstruction — same semantics as
    samplers.ald.ald_2d_time (reference: ALD_optimizers.py:330-554) with the
    measurement/operators as (re, im) float32 pairs. measurement:
    ((num_sens, B*T, H, W, C), same). Returns (xr, xi) of (B, T, H, W, C).
    """
    from .ald import setup_2d_time_ladders
    from ..operators.finite_diff import FiniteDiff

    # score_fn_T's labels index the RAW sigmas_T ladder (see ald.ald_2d_time)
    sigmas, sigmas_T_full, labels_T = setup_2d_time_ladders(
        sigmas, sigmas_T, mode_T)

    yr, yi = measurement
    num_sens, BT, H, W, C = yr.shape
    T = num_frames if num_frames is not None else BT
    B = BT // T
    finite_diff = FiniteDiff(dims=1)

    xr, xi = lin_tfm.conj_op(yr, yi)
    proximal = _bake_ahy(proximal, xr, xi)   # prox runs on the flat (B*T) layout
    xr = xr.reshape(B, T, H, W, C)
    xi = xi.reshape(B, T, H, W, C)
    sigma_last = sigmas[-1]
    sigma_T_last = sigmas_T_full[-1]
    L = sigmas.shape[0]

    inner_fn = _pair_2d_time_inner(
        score_fn_S, score_fn_T, proximal, finite_diff, config, mode_T,
        if_random_shift, win_size, sigma_last, sigma_T_last)

    def level_step(carry, inp):
        xr, xi, key = carry
        c, label_T, sigma, sigma_T = inp

        def inner(_, state):
            xr, xi, key = state
            return inner_fn(xr, xi, yr, yi, c, label_T, sigma, sigma_T,
                            lr_scaled, lamda_T, key)

        xr, xi, key = lax.fori_loop(0, config.n_steps_each, inner,
                                    (xr, xi, key))
        _maybe_snapshot(snapshot_fn, config, c, sigma, xr, xi)
        return (xr, xi, key), None

    (xr, xi, key), _ = lax.scan(
        level_step, (xr, xi, key),
        (jnp.arange(L, dtype=jnp.int32), labels_T, jnp.asarray(sigmas),
         sigmas_T_full))
    return xr, xi


def make_stepped_pair_reconstructor(module, sigmas: jnp.ndarray, lin_tfm,
                                    proximal,
                                    config: ALDConfig = ALDConfig(),
                                    lr_scaled: float = 1.0,
                                    seg_fn: Optional[Callable] = None,
                                    seg_label: Optional[jnp.ndarray] = None,
                                    seg_lamda: float = 1.0,
                                    seg_start_time: float = 1.0,
                                    seg_step_type: str = "linear",
                                    seg_mode: str = "full",
                                    seg_params=None,
                                    snapshot_fn: Optional[Callable] = None):
    """Host-scheduled variant: one jitted sigma-LEVEL step (compiles like a
    single forward) looped over levels on the host with async dispatch.

    Numerically identical to `ald_inverse_proximal_pair` (including the
    segmentation-guidance ramp when `seg_fn`/`seg_label` are given); use it
    where a whole-chain `lax.scan` program is impractical to compile (e.g.
    the axon remote-compile service rejects large programs). Returns
    `recon(params, yr, yi, key) -> (xr, xi)`.

    Pass the seg net's weights via `seg_params` (then `seg_fn(seg_params,
    x)` is called) rather than closed over inside `seg_fn`: closed-over
    pytrees are inlined as HLO constants (slow lowering / remote-compile
    aborts on axon — see CLAUDE.md), and a weights-as-argument program is
    shared across factory instances.
    """
    sigmas = jnp.asarray(sigmas)
    sigma_last = sigmas[-1]
    L = int(sigmas.shape[0])
    lh_weights = get_lh_weights(sigmas, seg_start_time, seg_step_type)
    use_seg = seg_fn is not None
    if use_seg:
        from .ald import compute_seg_grad
        assert seg_label is not None, "seg_fn given but seg_label is None"
        seg_label2 = stack_parts(seg_label, seg_label)
    else:
        seg_label2 = None

    # everything a tuning loop sweeps (lr_scaled, seg_lamda) or that holds
    # weights/labels (seg_params_t, seg_label_t) is a traced ARGUMENT, not
    # a baked constant: every grid point / test slice shares one compiled
    # program (identical HLO -> persistent-cache hit even across factory
    # instances)
    # the proximal travels as a jit ARGUMENT (it's a pytree holding the
    # mask/coil maps and, after _bake_ahy, the precomputed A^H y) — closing
    # over it would inline megabytes of HLO constants (see module docstring)
    @jax.jit
    def level_step(params, prox, xr, xi, yr, yi, c, sigma, lh_w, lr_scaled_t,
                   seg_lamda_t, seg_params_t, seg_label_t, key):
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            xr, xi, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(xr, xi)
            grads = score_fn(stacked, _labels(stacked, c))
            if use_seg:
                sfn = seg_fn if seg_params_t is None \
                    else (lambda x: seg_fn(seg_params_t, x))
                g_seg = compute_seg_grad(sfn, stacked, seg_label_t,
                                         seg_mode)
                grads = grads + g_seg / sigma * (lh_w * seg_lamda_t)
            g_re, g_im = unstack_parts(grads)
            xr = _langevin_update(xr, g_re, step_size, k_re)
            xi = _langevin_update(xi, g_im, step_size, k_im)
            xr, xi = prox(xr, xi, yr, yi,
                          config.step_lr * lr_scaled_t, 1.0)
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

    # lr_scaled may be a scalar or a PER-LEVEL schedule (L,) — e.g. an
    # annealed data-consistency weight (low early, high late), a stability
    # mitigation for trained priors whose effective-weight edge binds
    # (docs/RESULTS_ACDC_SENSE.md). Each level still receives a traced
    # SCALAR, so every schedule shares the one compiled program.
    lr_sched = jnp.broadcast_to(
        jnp.asarray(lr_scaled, jnp.float32).reshape(-1), (L,))
    seg_lamda_t = jnp.float32(seg_lamda)

    def recon(params, yr, yi, key):
        xr, xi = lin_tfm.conj_op(yr, yi)
        prox = _bake_ahy(proximal, xr, xi)
        for c in range(L):
            xr, xi, key = level_step(params, prox, xr, xi, yr, yi,
                                     jnp.int32(c), sigmas[c],
                                     lh_weights[c], lr_sched[c],
                                     seg_lamda_t, seg_params, seg_label2,
                                     key)
            # host-stepped loop: call the diagnostics hook directly
            if (snapshot_fn is not None and config.snapshot_every > 0
                    and c % config.snapshot_every == 0):
                snapshot_fn(c, float(sigmas[c]), xr, xi)
        if config.denoise:
            xr, xi = denoise(params, xr, xi)
        return xr, xi

    return recon


def make_stepped_2d_time_pair_reconstructor(
        module_S, module_T, sigmas: jnp.ndarray, sigmas_T: jnp.ndarray,
        lin_tfm, proximal,
        config: ALDConfig = ALDConfig(),
        lr_scaled: float = 1.0,
        mode_T: str = "diffusion1d",
        lamda_T: float = 1.0,
        if_random_shift: bool = False,
        win_size: int = 8,
        num_frames: Optional[int] = None,
        snapshot_fn: Optional[Callable] = None):
    """Host-scheduled 2D+time variant (cf. make_stepped_pair_reconstructor):
    one jitted sigma-LEVEL step — spatial score + temporal score/TV +
    proximal — looped over levels on the host with async dispatch.
    Numerically identical to `ald_2d_time_pair`; use it where a whole-chain
    `lax.scan` program is impractical to compile (axon remote-compile
    rejects large programs). Score-net params stay explicit jit arguments.
    Returns `recon(params_S, params_T, yr, yi, key) -> (xr, xi)` with
    measurement pair (num_sens, B*T, H, W, C) and output (B, T, H, W, C).
    """
    from .ald import setup_2d_time_ladders
    from ..operators.finite_diff import FiniteDiff

    # score_T's labels index the RAW sigmas_T ladder (see ald.ald_2d_time)
    sigmas, sigmas_T_full, labels_T = setup_2d_time_ladders(
        sigmas, sigmas_T, mode_T)
    sigmas_T_raw = jnp.asarray(sigmas_T)
    sigma_last = sigmas[-1]
    sigma_T_last = sigmas_T_full[-1]
    L = int(sigmas.shape[0])
    finite_diff = FiniteDiff(dims=1)

    @jax.jit
    def level_step(params_S, params_T, prox, xr, xi, yr, yi, c, label_T,
                   sigma, sigma_T, lr_scaled_t, lamda_T_t, key):
        def score_S(x, labels):
            return module_S.apply({"params": params_S}, x, sigmas[labels])

        def score_T(x, labels):
            return module_T.apply({"params": params_T}, x,
                                  sigmas_T_raw[labels])

        inner_fn = _pair_2d_time_inner(
            score_S, score_T, prox, finite_diff, config, mode_T,
            if_random_shift, win_size, sigma_last, sigma_T_last)

        def inner(_, state):
            xr, xi, key = state
            return inner_fn(xr, xi, yr, yi, c, label_T, sigma, sigma_T,
                            lr_scaled_t, lamda_T_t, key)

        return lax.fori_loop(0, config.n_steps_each, inner, (xr, xi, key))

    lr_scaled_t = jnp.float32(lr_scaled)
    lamda_T_t = jnp.float32(lamda_T)

    def recon(params_S, params_T, yr, yi, key):
        num_sens, BT, H, W, C = yr.shape
        T = num_frames if num_frames is not None else BT
        B = BT // T
        xr, xi = lin_tfm.conj_op(yr, yi)
        prox = _bake_ahy(proximal, xr, xi)   # prox runs on the flat layout
        xr = xr.reshape(B, T, H, W, C)
        xi = xi.reshape(B, T, H, W, C)
        for c in range(L):
            xr, xi, key = level_step(params_S, params_T, prox, xr, xi,
                                     yr, yi,
                                     jnp.int32(c), labels_T[c], sigmas[c],
                                     sigmas_T_full[c], lr_scaled_t,
                                     lamda_T_t, key)
            if (snapshot_fn is not None and config.snapshot_every > 0
                    and c % config.snapshot_every == 0):
                snapshot_fn(c, float(sigmas[c]), xr, xi)
        return xr, xi

    return recon
