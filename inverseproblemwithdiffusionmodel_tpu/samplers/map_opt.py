"""MAP reconstruction with a score prior, and TV-regularized least squares.

Reference semantics: ncsn/models/MAP_optimizers.py (MAPOptimizer :55-116,
SENSEMAP/Inpainting :119-124, MAPOptimizer2DTime :154-337) and the TV
baseline of scripts/acdc_SENSE_TV.py (MAPModel, helpers/pl_helpers.py:402-442).

TPU-first design: the whole optimization is one `lax.scan` over iterations
with an optax Adam. The complex image is optimized as a stacked real pytree
{re, im} - exactly how torch.Adam treats complex parameters (per-component
moments), and what MAPOptimizer2DTime does explicitly with its two
optimizers. Ascent on the log-posterior == descent on -(grad_data +
lamda * grad_prior), reference :98-116.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import optax

from .ald import ScoreFn, _labels
from ..operators.base import LinearTransform
from ..operators.finite_diff import FiniteDiff
from ..utils.reshape import apply_in_tube_space
from ..utils.misc import stack_parts, unstack_parts


@dataclasses.dataclass(frozen=True)
class MAPConfig:
    n_iters: int = 200
    lr: float = 1e-3
    b1: float = 0.5
    b2: float = 0.5


def _to_pair(z: jnp.ndarray):
    return {"re": jnp.real(z), "im": jnp.imag(z)}


def _to_complex(p) -> jnp.ndarray:
    return p["re"] + 1j * p["im"]


def _run_adam(grad_fn: Callable[[jnp.ndarray], jnp.ndarray], x0: jnp.ndarray,
              config: MAPConfig) -> jnp.ndarray:
    """Ascent via Adam on the complex image; grad_fn returns the ascent
    direction (complex)."""
    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)
    params = _to_pair(x0)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        g = grad_fn(_to_complex(params))
        # maximizing: descend on the negated gradient (reference :106-109)
        updates = {"re": -jnp.real(g), "im": -jnp.imag(g)}
        updates, opt_state = opt.update(updates, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    (params, _), _ = lax.scan(step, (params, opt_state), None,
                              length=config.n_iters)
    return _to_complex(params)


def map_optimizer(
    score_fn: ScoreFn,
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    lamda: float,
    config: MAPConfig = MAPConfig(),
    x_init: Optional[jnp.ndarray] = None,
    prior_label: int = 1,
) -> jnp.ndarray:
    """MAP reconstruction (reference: MAP_optimizers.py:55-116; `Inpainting`
    and `SENSEMAP` are this with the matching lin_tfm, :119-124).

    grad = A^H(y - A x) + lamda * (s(Re x) + i s(Im x)), evaluated at noise
    label `prior_label` (the reference fixes labels = 1, :101-104).
    """
    x0 = lin_tfm.conj_op(measurement) if x_init is None else x_init

    def ascent_grad(x):
        grad_data = lin_tfm.log_lh_grad(x, measurement, 1.0)
        stacked = stack_parts(jnp.real(x), jnp.imag(x))
        grads = score_fn(stacked, _labels(stacked, prior_label))
        g_re, g_im = unstack_parts(grads)
        return grad_data + lamda * (g_re + 1j * g_im)

    return _run_adam(ascent_grad, x0, config)


def map_optimizer_2d_time(
    score_fn_S: Optional[ScoreFn],
    score_fn_T: Optional[ScoreFn],
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    config: MAPConfig = MAPConfig(),
    prior_weight: float = 1.0,
    spatial_step_weight: float = 1.0,
    temporal_step_weight: float = 1.0,
    mode_T: str = "diffusion1d",
    if_random_shift: bool = False,
    win_size: int = 8,
    num_frames: Optional[int] = None,
    x_init: Optional[jnp.ndarray] = None,
    prior_label: int = 1,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """2D+time MAP reconstruction (reference: MAP_optimizers.py:154-337).

    measurement: (num_sens, B*T, H, W, C). grad = grad_data + prior_weight *
    (w_S * grad_S + w_T * grad_T); Adam on Re/Im.
    """
    assert mode_T in ("tv", "diffusion1d", "none")
    num_sens, BT, H, W, C = measurement.shape
    T = num_frames if num_frames is not None else BT
    B = BT // T
    finite_diff = FiniteDiff(dims=1)
    if key is None:
        key = jax.random.PRNGKey(0)

    if x_init is None:
        x0 = lin_tfm.conj_op(measurement).reshape(B, T, H, W, C)
    else:
        x0 = x_init

    def data_grad(x):
        frames = x.reshape(B * T, H, W, C)
        g = lin_tfm.log_lh_grad(frames, measurement)
        return g.reshape(B, T, H, W, C)

    def spatial_grad(x):
        if score_fn_S is None or spatial_step_weight == 0.0:
            return jnp.zeros_like(x)
        frames = x.reshape(B * T, H, W, C)
        stacked = stack_parts(jnp.real(frames), jnp.imag(frames))
        grads = score_fn_S(stacked, _labels(stacked, prior_label))
        g_re, g_im = unstack_parts(grads)
        return (g_re + 1j * g_im).reshape(B, T, H, W, C)

    def temporal_grad(x, key):
        if mode_T == "none" or temporal_step_weight == 0.0:
            return jnp.zeros_like(x)
        if mode_T == "tv":
            g_re = finite_diff.log_lh_grad(jnp.real(x))
            g_im = finite_diff.log_lh_grad(jnp.imag(x))
            return g_re + 1j * g_im
        def tube_grad(tubes):
            stacked = stack_parts(jnp.real(tubes), jnp.imag(tubes))
            grads = score_fn_T(stacked, _labels(stacked, prior_label))
            g_re, g_im = unstack_parts(grads)
            return (g_re + 1j * g_im,)

        (g,) = apply_in_tube_space(tube_grad, (x,), win_size, key=key,
                                   if_random_shift=if_random_shift)
        return g

    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)
    params = _to_pair(x0)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state, key = carry
        key, k_t = jax.random.split(key)
        x = _to_complex(params)
        g = data_grad(x) + prior_weight * (
            spatial_step_weight * spatial_grad(x)
            + temporal_step_weight * temporal_grad(x, k_t))
        updates = {"re": -jnp.real(g), "im": -jnp.imag(g)}
        updates, opt_state = opt.update(updates, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), None

    (params, _, _), _ = lax.scan(step, (params, opt_state, key), None,
                                 length=config.n_iters)
    return _to_complex(params)


def _safe_modulus(sq: jnp.ndarray) -> jnp.ndarray:
    """sqrt(sq) with a zero (not NaN) gradient at sq == 0 — torch's
    sgn(0) = 0 subgradient convention for abs()."""
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def tv_norm_noncircular(x: jnp.ndarray, spatial_axes: Tuple[int, int]) -> jnp.ndarray:
    """Anisotropic-in-space TV with open boundaries, matching
    kornia.losses.TotalVariation used by the reference TV baseline
    (scripts/acdc_SENSE_TV.py:16,78): sum_axis sum |diff(x, axis)|.
    For complex x, |.| is the complex modulus (kornia's .abs() on the
    reference's complex nn.Parameter, MAP_optimizers.py:45)."""
    if jnp.iscomplexobj(x):
        return tv_norm_noncircular_pair(jnp.real(x), jnp.imag(x),
                                        spatial_axes)
    ax0, ax1 = spatial_axes
    d0 = jnp.diff(x, axis=ax0)
    d1 = jnp.diff(x, axis=ax1)
    return jnp.sum(jnp.abs(d0)) + jnp.sum(jnp.abs(d1))


def tv_norm_noncircular_pair(re: jnp.ndarray, im: jnp.ndarray,
                             spatial_axes: Tuple[int, int]) -> jnp.ndarray:
    """Complex-modulus TV on a (Re, Im) pair:
    sum_axis sum sqrt(diff(Re)^2 + diff(Im)^2) — the pair form of
    kornia TotalVariation applied to a complex image."""
    ax0, ax1 = spatial_axes
    out = jnp.asarray(0.0, dtype=re.dtype)
    for ax in (ax0, ax1):
        dr = jnp.diff(re, axis=ax)
        di = jnp.diff(im, axis=ax)
        out = out + jnp.sum(_safe_modulus(dr * dr + di * di))
    return out


def tv_reconstruction(
    measurement: jnp.ndarray,
    lin_tfm: LinearTransform,
    reg_weight: float,
    config: MAPConfig = MAPConfig(),
    x_init: Optional[jnp.ndarray] = None,
    spatial_axes: Tuple[int, int] = (1, 2),
    regularizer=None,
) -> jnp.ndarray:
    """TV-regularized least squares baseline (reference: MAPModel +
    TrainMAPModel, helpers/pl_helpers.py:402-442):
    min_x 0.5 ||A x - y||^2 + w * TV(x), TV with complex-modulus
    differences (kornia TotalVariation on the complex parameter).

    The penalty is pluggable: pass any `regularizers.AbstractRegularizer`
    (default `TVRegularizer(reg_weight, spatial_axes)`; `reg_weight` then
    scales IT, matching the reference's `w * TV`)."""
    from ..regularizers import TVRegularizer
    if regularizer is None:
        regularizer = TVRegularizer(reg_weight, spatial_axes)
    x0 = lin_tfm.conj_op(measurement) if x_init is None else x_init

    def loss_fn(p):
        x = _to_complex(p)
        res = lin_tfm(x) - measurement
        data = 0.5 * jnp.sum(jnp.abs(res) ** 2)
        return data + regularizer.pair(p["re"], p["im"])

    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)
    params = _to_pair(x0)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    (params, _), _ = lax.scan(step, (params, opt_state), None,
                              length=config.n_iters)
    return _to_complex(params)
