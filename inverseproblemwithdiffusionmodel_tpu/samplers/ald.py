"""Annealed Langevin dynamics samplers, compiled to single XLA computations.

Reference semantics: ncsn/models/ALD_optimizers.py (ALDOptimizer :49-155,
ALDUnconditionalSampler :158, ALDInvSegProximalRealImag :161-327,
ALD2DTime :330-581) and ncsn/models/__init__.py:41-82.

TPU-first design:
- the (noise level x inner step) double loop is a `lax.scan` over levels with
  a `lax.fori_loop` inside - the whole reconstruction is ONE compiled
  program; no host round-trips in the hot loop (the reference prints tensor
  min/max every step, ALD_optimizers.py:119,243-250).
- real & imaginary score evaluations are batched into a single forward pass
  of batch 2B (the reference runs the net twice, :227-228) - better MXU
  utilization at identical semantics (the score nets act per-sample).
- proximal data consistency (FFT pairs) fuses into the same program.
- PRNG is explicit: one key threaded through the scan.
- ensembles are batch rows; shard the batch axis over a mesh
  (see parallel/ensemble.py).

Score function interface: `score_fn(x, labels) -> score` where labels is an
int32 (B,) array of noise-level indices; build one with
`models.registry.make_score_fn`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .sigmas import get_lh_weights
from ..operators.base import LinearTransform
from ..operators.proximal import Proximal
from ..operators.finite_diff import FiniteDiff
from ..utils.reshape import apply_in_tube_space
from ..utils.misc import stack_parts, unstack_parts

ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class ALDConfig:
    """Static sampler parameters (reference `params` dict,
    ALD_optimizers.py:50-56). snapshot_every > 0 emits a diagnostics
    callback every that-many levels (see `_maybe_snapshot`)."""
    n_steps_each: int = 3
    step_lr: float = 9e-7
    denoise: bool = True
    final_only: bool = True
    snapshot_every: int = 0


def _labels(x: jnp.ndarray, c) -> jnp.ndarray:
    return jnp.full((x.shape[0],), c, dtype=jnp.int32)


def _langevin_update(x: jnp.ndarray, grad: jnp.ndarray, step_size,
                     key: jax.Array) -> jnp.ndarray:
    noise = jax.random.normal(key, x.shape, x.dtype)
    return x + step_size * grad + noise * jnp.sqrt(step_size * 2.0)


def _maybe_snapshot(snapshot_fn, config: ALDConfig, c, sigma, *arrays):
    """Optional mid-chain diagnostics (reference saves snapshot images and
    temporal profiles inside its Python loop, ALD_optimizers.py:203-213,
    556-581). TPU-native form: a `jax.debug.callback` island gated by
    `lax.cond` on the level index — the scan stays one compiled program,
    the callback fires asynchronously only on emitting levels, and costs
    nothing when snapshot_every == 0 (no trace-time emission at all).

    snapshot_fn(level:int, sigma:float, *arrays:np.ndarray) runs on host.
    """
    if snapshot_fn is None or config.snapshot_every <= 0:
        return

    def _emit():
        jax.debug.callback(snapshot_fn, c, sigma, *arrays)

    lax.cond(c % config.snapshot_every == 0, _emit, lambda: None)


# ---------------------------------------------------------------------------
# Unconditional sampling
# ---------------------------------------------------------------------------

def ald_unconditional_sampler(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    shape: Tuple[int, ...],
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    x_init: Optional[jnp.ndarray] = None,
    snapshot_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Prior sampling by annealed Langevin dynamics
    (reference: ALD_optimizers.py:66-137 with default hooks).

    shape: (B, *feature). x starts at U(0, 1) unless x_init is given.
    snapshot_fn(level, sigma, x): optional host diagnostics every
    config.snapshot_every levels.
    """
    key, key_init = jax.random.split(key)
    x = jax.random.uniform(key_init, shape) if x_init is None else x_init
    sigma_last = sigmas[-1]
    L = sigmas.shape[0]

    def level_step(carry, inp):
        x, key = carry
        c, sigma = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x, key = state
            key, kn = jax.random.split(key)
            grad = score_fn(x, _labels(x, c))
            return _langevin_update(x, grad, step_size, kn), key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        _maybe_snapshot(snapshot_fn, config, c, sigma, x)
        return (x, key), None

    (x, key), _ = lax.scan(level_step, (x, key),
                           (jnp.arange(L, dtype=jnp.int32), sigmas))

    if config.denoise:
        x = x + sigma_last**2 * score_fn(x, _labels(x, L - 1))
    return x


# ---------------------------------------------------------------------------
# Guidance gradients (classifier / segmentation)
# ---------------------------------------------------------------------------

def compute_clf_grad(clf_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     x: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
    """grad_x sum_b log softmax(clf(x))[b, cls_b]
    (reference: ncsn/models/__init__.py:172-194)."""

    def logp(x_in):
        logits = clf_fn(x_in)
        logps = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(jnp.take_along_axis(logps, cls[:, None], axis=-1))

    return jax.grad(logp)(x)


def compute_seg_grad(seg_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     x: jnp.ndarray, label: jnp.ndarray,
                     mode: str = "full") -> jnp.ndarray:
    """grad_x sum log softmax(seg(x)) gathered at the per-pixel target label
    (reference: ncsn/models/__init__.py:197-215).

    x: (B, H, W, C); label: (B, H, W) int. mode='FG' masks the gradient to
    foreground pixels.
    """
    assert mode in ("full", "FG")

    def logp(x_in):
        logits = seg_fn(x_in)                      # (B, H, W, K)
        logps = jax.nn.log_softmax(logits, axis=-1)
        sel = jnp.take_along_axis(logps, label[..., None], axis=-1)
        return jnp.sum(sel)

    grad = jax.grad(logp)(x)
    if mode == "FG":
        grad = grad * label[..., None].astype(grad.dtype)
    return grad


# ---------------------------------------------------------------------------
# Inverse problem: seg-guided ALD with proximal data consistency (Re/Im)
# ---------------------------------------------------------------------------

def ald_inverse_seg_proximal_real_imag(
    score_fn: ScoreFn,
    sigmas: jnp.ndarray,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    proximal: Proximal,
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
) -> jnp.ndarray:
    """Headline single-coil / SENSE reconstruction sampler
    (reference: ALD_optimizers.py:161-327).
    snapshot_fn(level, sigma, x_re, x_im): optional host diagnostics every
    config.snapshot_every levels (the reference's snapshot saves, :203-213).

    Initializes at A^H y; per (level, step): one batched Re/Im score forward,
    optional segmentation-guidance gradient (ramped by `seg_start_time`),
    Langevin update, then a proximal data-consistency step in the complex
    domain with coefficient step_lr * lr_scaled. Returns complex (B, H, W, C).
    """
    x0 = lin_tfm.conj_op(measurement)
    x_re, x_im = jnp.real(x0), jnp.imag(x0)
    sigma_last = sigmas[-1]
    L = sigmas.shape[0]
    lh_weights = get_lh_weights(sigmas, seg_start_time, seg_step_type)
    use_seg = seg_fn is not None
    if use_seg:
        assert seg_label is not None
        # the seg net sees Re and Im separately, same label for both
        seg_label2 = stack_parts(seg_label, seg_label)

    def level_step(carry, inp):
        x_re, x_im, key = carry
        c, sigma, lh_w = inp
        step_size = config.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            x_re, x_im, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            # one forward pass over the interleaved [Re, Im] batch (2B);
            # the interleave keeps rows on their owning device when the
            # chain axis is sharded (no all-to-all, cf. utils.stack_parts)
            stacked = stack_parts(x_re, x_im)
            grads = score_fn(stacked, _labels(stacked, c))
            if use_seg:
                g_seg = compute_seg_grad(seg_fn, stacked, seg_label2, seg_mode)
                grads = grads + g_seg / sigma * (lh_w * seg_lamda)
            g_re, g_im = unstack_parts(grads)
            x_re = _langevin_update(x_re, g_re, step_size, k_re)
            x_im = _langevin_update(x_im, g_im, step_size, k_im)
            # proximal step in the complex domain; coeff = step_lr * lr_scaled
            # (reference uses the UNSCALED step_lr here, :247,313-315)
            z = x_re + 1j * x_im
            z = proximal(z, measurement, config.step_lr * lr_scaled, 1.0)
            return jnp.real(z), jnp.imag(z), key

        x_re, x_im, key = lax.fori_loop(0, config.n_steps_each, inner,
                                        (x_re, x_im, key))
        _maybe_snapshot(snapshot_fn, config, c, sigma, x_re, x_im)
        return (x_re, x_im, key), None

    (x_re, x_im, key), _ = lax.scan(
        level_step, (x_re, x_im, key),
        (jnp.arange(L, dtype=jnp.int32), sigmas, lh_weights))

    if config.denoise:
        stacked = stack_parts(x_re, x_im)
        grads = score_fn(stacked, _labels(stacked, L - 1))
        g_re, g_im = unstack_parts(grads)
        x_re = x_re + sigma_last**2 * g_re
        x_im = x_im + sigma_last**2 * g_im

    return x_re + 1j * x_im


# ---------------------------------------------------------------------------
# 2D + time factorized sampler
# ---------------------------------------------------------------------------

def interp_sigmas_T(sigmas_S: np.ndarray, sigmas_T: np.ndarray) -> np.ndarray:
    """Nearest-interpolate the temporal ladder onto the tail of the spatial
    ladder; earlier levels get the sentinel -1 (skip temporal step)
    (reference: ALD_optimizers.py:342-345)."""
    sigmas_S = np.asarray(sigmas_S)
    sigmas_T = np.asarray(sigmas_T)
    n = int((sigmas_S <= sigmas_T[0]).sum())
    out = np.full(sigmas_S.shape, -1.0, dtype=np.float32)
    if n == 0:
        # temporal ladder entirely below the spatial ladder: the temporal
        # step would never activate (out[-0:] would also mis-slice)
        raise ValueError(
            f"temporal ladder (max {sigmas_T[0]:g}) lies entirely below "
            f"the spatial ladder (min {sigmas_S.min():g}); no level would "
            "run a temporal step — check sigma_begin_T/sigma_end_S")
    # torch F.interpolate(mode="nearest") from len L_T to len n
    idx = (np.arange(n) * sigmas_T.shape[0] / n).astype(np.int64)
    out[-n:] = sigmas_T[idx]
    return out


def interp_sigma_T_indices(sigmas_S: np.ndarray, sigmas_T: np.ndarray
                           ) -> np.ndarray:
    """RAW-temporal-ladder index for each spatial level: the label the
    temporal score net receives, so `sigmas_T[indices[c]] ==
    interp_sigmas_T(...)[c]` on active levels. This is the re-laddering the
    reference performs by overwriting `scorenet_T.sigmas` with the
    interpolated ladder (ALD_optimizers.py:342-346). Inactive early levels
    (sentinel -1) map to 0 — never evaluated (the temporal step is
    lax.cond-gated on sigma_T > 0)."""
    sigmas_S = np.asarray(sigmas_S)
    sigmas_T = np.asarray(sigmas_T)
    n = int((sigmas_S <= sigmas_T[0]).sum())
    if n == 0:
        raise ValueError("temporal ladder entirely below the spatial ladder")
    out = np.zeros(sigmas_S.shape, dtype=np.int32)
    out[-n:] = (np.arange(n) * sigmas_T.shape[0] / n).astype(np.int32)
    return out


def setup_2d_time_ladders(sigmas, sigmas_T, mode_T: str):
    """Resolve the (spatial ladder, per-level temporal sigma, per-level RAW
    temporal label) triple shared by every 2D+time sampler variant.

    - '*-only' modes swap the temporal ladder in as the scan ladder
      (reference: ALD_optimizers.py:355-361).
    - 'diffusion1d' nearest-interpolates sigmas_T onto the tail of the
      spatial ladder (:342-345), with sentinel -1 on inactive early levels;
      the non-overlap guard in interp_sigmas_T applies.
    - 'tv'/'none' never read the temporal ladder: sentinel arrays are
      returned and the overlap guard deliberately does NOT fire (the
      reference computes the interp unconditionally but never uses it in
      these modes).
    """
    assert mode_T in ("tv", "diffusion1d", "none", "diffusion1d-only",
                      "tv-only")
    sigmas_np = np.asarray(sigmas)
    sigmas_T_np = np.asarray(sigmas_T)
    if mode_T in ("diffusion1d-only", "tv-only"):
        scan_sigmas = jnp.asarray(sigmas_T)
        sigmas_T_full = jnp.asarray(sigmas_T)
        labels_T = jnp.arange(sigmas_T_np.shape[0], dtype=jnp.int32)
    elif "diffusion1d" in mode_T:
        scan_sigmas = jnp.asarray(sigmas)
        sigmas_T_full = jnp.asarray(interp_sigmas_T(sigmas_np, sigmas_T_np))
        labels_T = jnp.asarray(interp_sigma_T_indices(sigmas_np, sigmas_T_np))
    else:
        scan_sigmas = jnp.asarray(sigmas)
        sigmas_T_full = jnp.full(sigmas_np.shape, -1.0, dtype=jnp.float32)
        labels_T = jnp.zeros(sigmas_np.shape, dtype=jnp.int32)
    return scan_sigmas, sigmas_T_full, labels_T


def ald_2d_time(
    score_fn_S: ScoreFn,
    score_fn_T: Optional[ScoreFn],
    sigmas: jnp.ndarray,
    sigmas_T: jnp.ndarray,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    proximal: Proximal,
    key: jax.Array,
    config: ALDConfig = ALDConfig(),
    lr_scaled: float = 1.0,
    mode_T: str = "diffusion1d",
    lamda_T: float = 1.0,
    if_random_shift: bool = False,
    win_size: int = 8,
    num_frames: Optional[int] = None,
    snapshot_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Factorized 2D+time cine reconstruction
    (reference: ALD_optimizers.py:330-554).
    snapshot_fn(level, sigma, x_re, x_im) with (B, T, H, W, C) parts:
    optional host diagnostics every config.snapshot_every levels (the
    reference's `_screenshot` temporal profiles, :556-581).

    measurement: (num_sens, B*T, H, W, C) complex. Per (level, step):
      spatial step - 2-D score on all frames (Re/Im batched into 2*B*T),
      temporal step - 'tv' subgradient or 1-D score over kx*ky pixel tubes
        ('diffusion1d'), with optional random spatial shift de-aliasing,
      proximal step - data consistency over all frames.
    score_fn_T's integer labels index the RAW sigmas_T ladder (build it
    with make_score_fn(module_T, params_T, sigmas_T)); the sampler maps
    spatial levels onto it internally via interp_sigma_T_indices, the
    analog of the reference overwriting scorenet_T.sigmas with the
    interpolated ladder (ALD_optimizers.py:342-346).
    mode_T in {tv, diffusion1d, none, diffusion1d-only, tv-only}; the *-only
    modes skip the spatial step and run the full temporal ladder
    (reference: :355-361).
    Returns complex (B, T, H, W, C).
    """
    assert mode_T in ("tv", "diffusion1d", "none", "diffusion1d-only", "tv-only")
    skip_spatial = mode_T in ("diffusion1d-only", "tv-only")
    use_temporal_diffusion = "diffusion1d" in mode_T
    use_tv = "tv" in mode_T

    sigmas, sigmas_T_full, labels_T = setup_2d_time_ladders(
        sigmas, sigmas_T, mode_T)

    num_sens, BT, H, W, C = measurement.shape
    T = num_frames if num_frames is not None else BT
    B = BT // T
    finite_diff = FiniteDiff(dims=1)  # frame axis of (B, T, H, W, C)

    x = lin_tfm.conj_op(measurement)            # (B*T, H, W, C)
    x = x.reshape(B, T, H, W, C)
    sigma_last = sigmas[-1]
    sigma_T_last = sigmas_T_full[-1]
    L = sigmas.shape[0]

    def spatial_step(x, c, sigma, key):
        if skip_spatial:
            return x
        step_size = config.step_lr * (sigma / sigma_last) ** 2
        frames = x.reshape(B * T, H, W, C)
        stacked = stack_parts(jnp.real(frames), jnp.imag(frames))
        grads = score_fn_S(stacked, _labels(stacked, c))
        g_re, g_im = unstack_parts(grads)
        k_re, k_im = jax.random.split(key)
        new_re = _langevin_update(jnp.real(frames), g_re, step_size, k_re)
        new_im = _langevin_update(jnp.imag(frames), g_im, step_size, k_im)
        return (new_re + 1j * new_im).reshape(B, T, H, W, C)

    def temporal_step(x, c, sigma_T, key):
        if use_tv:
            x_re = jnp.real(x) + finite_diff.log_lh_grad(jnp.real(x), lamda=lamda_T)
            x_im = jnp.imag(x) + finite_diff.log_lh_grad(jnp.imag(x), lamda=lamda_T)
            return x_re + 1j * x_im
        if not use_temporal_diffusion:
            return x

        def do_step(x):
            key_shift, key_re, key_im = jax.random.split(key, 3)
            step_size = (config.step_lr * (sigma_T / sigma_T_last) ** 2) * lamda_T

            def tube_update(tubes):  # (B', T, k^2)
                stacked = stack_parts(jnp.real(tubes), jnp.imag(tubes))
                grads = score_fn_T(stacked, _labels(stacked, labels_T[c]))
                g_re, g_im = unstack_parts(grads)
                t_re = _langevin_update(jnp.real(tubes), g_re, step_size, key_re)
                t_im = _langevin_update(jnp.imag(tubes), g_im, step_size, key_im)
                return (t_re + 1j * t_im,)

            (out,) = apply_in_tube_space(tube_update, (x,), win_size,
                                         key=key_shift,
                                         if_random_shift=if_random_shift)
            return out

        # sentinel -1: temporal ladder not active yet (:466-467)
        return lax.cond(sigma_T > 0, do_step, lambda x: x, x)

    def proximal_step(x):
        frames = x.reshape(B * T, H, W, C)
        out = proximal(frames, measurement, config.step_lr * lr_scaled, 1.0)
        return out.reshape(B, T, H, W, C)

    def level_step(carry, inp):
        x, key = carry
        c, sigma, sigma_T = inp

        def inner(_, state):
            x, key = state
            key, k_s, k_t = jax.random.split(key, 3)
            x = spatial_step(x, c, sigma, k_s)
            x = temporal_step(x, c, sigma_T, k_t)
            x = proximal_step(x)
            return x, key

        x, key = lax.fori_loop(0, config.n_steps_each, inner, (x, key))
        _maybe_snapshot(snapshot_fn, config, c, sigma,
                        jnp.real(x), jnp.imag(x))
        return (x, key), None

    (x, key), _ = lax.scan(level_step, (x, key),
                           (jnp.arange(L, dtype=jnp.int32), sigmas,
                            sigmas_T_full))
    # reference does no final denoise here (:415)
    return x
