"""Pair-native MAP reconstruction and TV least squares (TPU fast path).

Same semantics as samplers/map_opt.py (reference:
ncsn/models/MAP_optimizers.py:55-116 MAPOptimizer, :154-337
MAPOptimizer2DTime; TV baseline of scripts/acdc_SENSE_TV.py) but with the
measurement, operators, and image state in (re, im) float32 pair form
(operators/pair.py) — no complex dtype anywhere, so the whole optimization
runs on TPU backends without complex support and maps the DFTs onto the
MXU. Numerics match the complex implementations (tests/test_pair_ops.py).

Gradient identities used throughout (A a pair linear transform):
  data ascent grad = A^H (y - A x)      (log_lh_grad with lamda = 1)
  prior ascent grad = score(Re x) (+) i score(Im x) at a fixed noise label
Adam treats the {re, im} dict exactly as the complex versions treat the
stacked real pytree, so trajectories agree step for step.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import optax

from .ald import ScoreFn, _labels
from .map_opt import MAPConfig, tv_norm_noncircular_pair
from ..operators.finite_diff import FiniteDiff
from ..utils.reshape import apply_in_tube_space
from ..utils.misc import stack_parts, unstack_parts

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _data_grad_pair(lin_tfm, xr, xi, yr, yi) -> Pair:
    """A^H(y - A x) on pairs (operators/base.py log_lh_grad, lamda=1)."""
    fr, fi = lin_tfm(xr, xi)
    return lin_tfm.conj_op(yr - fr, yi - fi)


def _run_adam_pair(grad_fn: Callable[[jnp.ndarray, jnp.ndarray], Pair],
                   x0: Pair, config: MAPConfig) -> Pair:
    """Ascent via Adam on the (re, im) image pair; grad_fn returns the
    ascent direction pair (cf. map_opt._run_adam)."""
    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)
    params = {"re": x0[0], "im": x0[1]}
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        g_re, g_im = grad_fn(params["re"], params["im"])
        updates = {"re": -g_re, "im": -g_im}
        updates, opt_state = opt.update(updates, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    (params, _), _ = lax.scan(step, (params, opt_state), None,
                              length=config.n_iters)
    return params["re"], params["im"]


def map_optimizer_pair(
    score_fn: ScoreFn,
    measurement: Pair,
    lin_tfm,
    lamda: float,
    config: MAPConfig = MAPConfig(),
    x_init: Optional[Pair] = None,
    prior_label: int = 1,
) -> Pair:
    """Pair form of map_optimizer (reference: MAP_optimizers.py:55-116).
    measurement: (yr, yi). Returns the reconstruction pair (xr, xi)."""
    yr, yi = measurement
    x0 = lin_tfm.conj_op(yr, yi) if x_init is None else x_init

    def ascent_grad(xr, xi):
        gr, gi = _data_grad_pair(lin_tfm, xr, xi, yr, yi)
        stacked = stack_parts(xr, xi)
        grads = score_fn(stacked, _labels(stacked, prior_label))
        s_re, s_im = unstack_parts(grads)
        return gr + lamda * s_re, gi + lamda * s_im

    return _run_adam_pair(ascent_grad, x0, config)


def map_optimizer_2d_time_pair(
    score_fn_S: Optional[ScoreFn],
    score_fn_T: Optional[ScoreFn],
    measurement: Pair,
    lin_tfm,
    config: MAPConfig = MAPConfig(),
    prior_weight: float = 1.0,
    spatial_step_weight: float = 1.0,
    temporal_step_weight: float = 1.0,
    mode_T: str = "diffusion1d",
    if_random_shift: bool = False,
    win_size: int = 8,
    num_frames: Optional[int] = None,
    x_init: Optional[Pair] = None,
    prior_label: int = 1,
    key: Optional[jax.Array] = None,
) -> Pair:
    """Pair form of map_optimizer_2d_time (reference:
    MAP_optimizers.py:154-337). measurement: ((num_sens, B*T, H, W, C),
    same). Returns (xr, xi) of (B, T, H, W, C)."""
    assert mode_T in ("tv", "diffusion1d", "none")
    yr, yi = measurement
    num_sens, BT, H, W, C = yr.shape
    T = num_frames if num_frames is not None else BT
    B = BT // T
    finite_diff = FiniteDiff(dims=1)
    if key is None:
        key = jax.random.PRNGKey(0)

    if x_init is None:
        x0r, x0i = lin_tfm.conj_op(yr, yi)
        x0 = (x0r.reshape(B, T, H, W, C), x0i.reshape(B, T, H, W, C))
    else:
        x0 = x_init

    def data_grad(xr, xi) -> Pair:
        fr = xr.reshape(B * T, H, W, C)
        fi = xi.reshape(B * T, H, W, C)
        gr, gi = _data_grad_pair(lin_tfm, fr, fi, yr, yi)
        return gr.reshape(B, T, H, W, C), gi.reshape(B, T, H, W, C)

    def spatial_grad(xr, xi) -> Pair:
        if score_fn_S is None or spatial_step_weight == 0.0:
            return jnp.zeros_like(xr), jnp.zeros_like(xi)
        fr = xr.reshape(B * T, H, W, C)
        fi = xi.reshape(B * T, H, W, C)
        stacked = stack_parts(fr, fi)
        grads = score_fn_S(stacked, _labels(stacked, prior_label))
        g_re, g_im = unstack_parts(grads)
        return (g_re.reshape(B, T, H, W, C), g_im.reshape(B, T, H, W, C))

    def temporal_grad(xr, xi, key) -> Pair:
        if mode_T == "none" or temporal_step_weight == 0.0:
            return jnp.zeros_like(xr), jnp.zeros_like(xi)
        if mode_T == "tv":
            return (finite_diff.log_lh_grad(xr),
                    finite_diff.log_lh_grad(xi))
        def tube_grad(tr, ti):
            stacked = stack_parts(tr, ti)
            grads = score_fn_T(stacked, _labels(stacked, prior_label))
            return unstack_parts(grads)

        return apply_in_tube_space(tube_grad, (xr, xi), win_size, key=key,
                                   if_random_shift=if_random_shift)

    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)
    params = {"re": x0[0], "im": x0[1]}
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state, key = carry
        key, k_t = jax.random.split(key)
        xr, xi = params["re"], params["im"]
        dr, di = data_grad(xr, xi)
        sr, si = spatial_grad(xr, xi)
        tr, ti = temporal_grad(xr, xi, k_t)
        g_re = dr + prior_weight * (spatial_step_weight * sr
                                    + temporal_step_weight * tr)
        g_im = di + prior_weight * (spatial_step_weight * si
                                    + temporal_step_weight * ti)
        updates = {"re": -g_re, "im": -g_im}
        updates, opt_state = opt.update(updates, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), None

    (params, _, _), _ = lax.scan(step, (params, opt_state, key), None,
                                 length=config.n_iters)
    return params["re"], params["im"]


def make_stepped_map_pair_optimizer(module, sigmas: jnp.ndarray, lin_tfm,
                                    config: MAPConfig = MAPConfig(),
                                    prior_label: int = 1):
    """Host-scheduled MAP variant (cf. ald_pair.make_stepped_pair_*): ONE
    jitted Adam iteration — data grad + score prior ascent + optimizer
    update — looped `config.n_iters` times on the host with async dispatch.

    Numerically identical to `map_optimizer_pair` (same per-iteration
    math); use it where the whole-run `lax.scan` program is impractical to
    compile (the axon remote-compile service rejects large programs at
    256²-class geometry — see CLAUDE.md). Score-net params and the prior
    weight stay traced jit ARGUMENTS, so lamda tuning grids share one
    compiled program. Returns `run(params, yr, yi, lamda) -> (xr, xi)`.
    Reference semantics: ncsn/models/MAP_optimizers.py:55-116."""
    sigmas = jnp.asarray(sigmas)
    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)

    @jax.jit
    def init_step(lin_tfm, yr, yi):
        x0r, x0i = lin_tfm.conj_op(yr, yi)
        params = {"re": x0r, "im": x0i}
        return params, opt.init(params)

    @jax.jit
    def adam_step(net_params, lin_tfm, params, opt_state, yr, yi, lamda):
        xr, xi = params["re"], params["im"]
        gr, gi = _data_grad_pair(lin_tfm, xr, xi, yr, yi)
        stacked = stack_parts(xr, xi)
        grads = module.apply({"params": net_params}, stacked,
                             sigmas[_labels(stacked, prior_label)])
        s_re, s_im = unstack_parts(grads)
        updates = {"re": -(gr + lamda * s_re), "im": -(gi + lamda * s_im)}
        updates, opt_state = opt.update(updates, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def run(net_params, yr, yi, lamda):
        params, opt_state = init_step(lin_tfm, yr, yi)
        lamda = jnp.float32(lamda)
        for _ in range(config.n_iters):
            params, opt_state = adam_step(net_params, lin_tfm, params,
                                          opt_state, yr, yi, lamda)
        return params["re"], params["im"]

    return run


def tv_reconstruction_pair(
    measurement: Pair,
    lin_tfm,
    reg_weight: float,
    config: MAPConfig = MAPConfig(),
    x_init: Optional[Pair] = None,
    spatial_axes: Tuple[int, int] = (1, 2),
) -> Pair:
    """Pair form of tv_reconstruction (reference: MAPModel + TrainMAPModel,
    helpers/pl_helpers.py:402-442):
    min_x 0.5 ||A x - y||^2 + w * TV(x), TV with complex-modulus
    differences (kornia TotalVariation on the complex parameter)."""
    yr, yi = measurement
    x0 = lin_tfm.conj_op(yr, yi) if x_init is None else x_init

    def loss_fn(p):
        fr, fi = lin_tfm(p["re"], p["im"])
        data = 0.5 * (jnp.sum((fr - yr) ** 2) + jnp.sum((fi - yi) ** 2))
        reg = tv_norm_noncircular_pair(p["re"], p["im"], spatial_axes)
        return data + reg_weight * reg

    opt = optax.adam(config.lr, b1=config.b1, b2=config.b2)
    params = {"re": x0[0], "im": x0[1]}
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    (params, _), _ = lax.scan(step, (params, opt_state), None,
                              length=config.n_iters)
    return params["re"], params["im"]
