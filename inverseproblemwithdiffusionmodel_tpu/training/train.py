"""Jitted, mesh-sharded train steps for score / classifier / segmentation
models.

Reference semantics: helpers/pl_helpers.py — `TrainScoreModelDiscrete`
(:99-143: collate_batch then averaged Re/Im DSM losses), `TrainClf` (:190),
`TrainSeg` (:264). TPU-first: each step is one compiled XLA program with
params replicated and the batch sharded over the mesh `data` axis; XLA
derives the gradient psum over ICI from the sharding annotations (no
hand-written DataParallel, cf. models/utils.py:93).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .state import TrainState
from ..losses.dsm import anneal_dsm_score_estimation
from ..losses.guidance import clf_loss_with_perturbation, seg_loss_with_perturbation
from ..utils.misc import collate_batch, stack_parts
from ..parallel.mesh import data_sharding, replicated


def _shard_args(mesh: Optional[Mesh], tp: bool = False):
    if mesh is None:
        return {}
    if tp:
        # Tensor-parallel state: the caller places the TrainState with
        # `parallel.shard_tp` (conv output channels over the `model` axis)
        # and the batch with `shard_batch`; jit infers in/out shardings
        # from the committed arguments and GSPMD inserts the channel
        # collectives.
        return dict(donate_argnums=(0,))
    batch_sh = data_sharding(mesh)
    repl = replicated(mesh)
    return dict(in_shardings=(repl, batch_sh, repl), out_shardings=(repl, repl),
                donate_argnums=(0,))


def _mixed_precision_apply(module, compute_dtype):
    """apply fn with the standard TPU mixed-precision cast: params and
    array inputs to compute_dtype (bf16), output back to f32; grads flow to
    the f32 master params through the cast's transpose."""
    def apply_fn(params, *args, **kwargs):
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), params)
            args = tuple(
                jnp.asarray(a).astype(compute_dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a
                for a in args)
        out = module.apply({"params": params}, *args, **kwargs)
        return out.astype(jnp.float32)
    return apply_fn


def make_score_train_step(
    module,
    sigmas: jnp.ndarray,
    data_mode: str = "real-valued",
    anneal_power: float = 2.0,
    mesh: Optional[Mesh] = None,
    filter_th: Optional[float] = None,
    remat: bool = False,
    tp: bool = False,
    compute_dtype: Optional[Any] = None,
    if_centering: bool = False,
) -> Callable[[TrainState, jnp.ndarray, jax.Array], Tuple[TrainState, jnp.ndarray]]:
    """DSM train step. For 'real-imag' modes the loss is the mean of the DSM
    losses on the real and imaginary parts (reference:
    helpers/pl_helpers.py:127-138) — we batch both parts into one forward.

    filter_th: TV-norm foreground threshold for 1-D tube batches; low-TV
    (background) tubes get zero loss weight (the reference drops them,
    helpers/load_data.py:417-440).
    remat: rematerialize the whole forward in the backward pass
    (jax.checkpoint). Measured on v5e at 256^2 ngf128: ~4x slower and the
    peak barely drops (the full-graph recompute peaks like the plain
    bwd), so prefer remat=False — B=8 real-imag fits in 16G HBM — and use
    gradient accumulation (optax.MultiSteps) for larger effective batches.
    tp: tensor-parallel state over the mesh `model` axis — place the state
    with `parallel.shard_tp` and the batch with `parallel.shard_batch`
    before calling (see `_shard_args`).
    compute_dtype: jnp.bfloat16 runs the forward/backward network compute
    in bf16 (params + inputs cast in, loss and grads f32 via the cast's
    transpose; master params, Adam state and EMA stay f32) — the standard
    TPU mixed-precision recipe, same convention as
    `registry.make_score_fn`.
    """
    sigmas = jnp.asarray(sigmas)

    apply_fn = _mixed_precision_apply(module, compute_dtype)

    def loss_fn(params, batch, key):
        def raw_score(params, x, labels):
            return apply_fn(params, x, sigmas[labels])
        if remat:
            raw_score = jax.checkpoint(raw_score)

        def score_fn(x, labels):
            return raw_score(params, x, labels)

        key_collate, key_dsm = jax.random.split(key)
        if if_centering:
            # reference score training always centers to [-1, 1] BEFORE
            # collation (train_ncsn.py:69 hardcodes if_centering=True;
            # pl_helpers.py:126)
            batch = 2.0 * batch - 1.0
        weight = None
        if filter_th is not None:
            from ..utils.misc import filter_batch
            weight = filter_batch(batch, filter_th)
        parts = collate_batch(batch, data_mode, key_collate)
        if isinstance(parts, list):
            # one forward over the interleaved [Re, Im] batch (2B); the
            # interleave shards cleanly over the mesh (see stack_parts)
            x = stack_parts(*parts)
            if weight is not None:
                weight = stack_parts(weight, weight)
        else:
            x = parts
        return anneal_dsm_score_estimation(score_fn, x, sigmas, key_dsm,
                                           anneal_power=anneal_power,
                                           sample_weight=weight)

    def step(state: TrainState, batch: jnp.ndarray, key: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        return state.apply_gradients(grads), loss

    return jax.jit(step, **_shard_args(mesh, tp=tp))


def make_continuous_score_train_step(
    module,
    sde,
    mesh: Optional[Mesh] = None,
    continuous: bool = True,
    eps: float = 1e-5,
    reduce_mean: bool = True,
    data_mode: str = "real-valued",
    compute_dtype=None,
):
    """Continuous-time DSM train step against an SDE's marginal
    (reference: helpers/pl_helpers.py:31-96 `TrainScoreModel` +
    helpers/losses.py:7-24, which always uses the MEAN reduction — the
    default here; reduce_mean=False selects score_sde's 0.5*per-sample-sum
    weighting, what `config.training.reduce_mean=False` recipes mean).
    The raw network is conditioned per the sde convention
    (sde.get_score_fn semantics, models/utils.py:129-178).
    compute_dtype=jnp.bfloat16 runs the network compute in bf16 (master
    params stay f32), as in make_score_train_step.
    """
    from ..losses.dsm import continuous_dsm_loss
    from ..sde.sampling import get_score_fn
    apply_fn = _mixed_precision_apply(module, compute_dtype)
    # the continuous zoo trains with dropout ON (torch reference runs the
    # net in train mode, helpers/pl_helpers.py:31-96 via Lightning); Flax
    # needs the explicit train flag + a dropout rng
    from ..models.registry import module_takes_train
    takes_train = module_takes_train(module)

    def loss_fn(params, batch, key):
        key_collate, key_dsm, key_drop = jax.random.split(key, 3)
        if takes_train:
            model_fn = lambda x, cond: apply_fn(
                params, x, cond, train=True, rngs={"dropout": key_drop})
        else:
            model_fn = lambda x, cond: apply_fn(params, x, cond)
        score_fn = get_score_fn(sde, model_fn, continuous=continuous)
        parts = collate_batch(batch, data_mode, key_collate)
        x = stack_parts(*parts) if isinstance(parts, list) else parts
        return continuous_dsm_loss(score_fn, sde, x, key_dsm, eps=eps,
                                   reduce_mean=reduce_mean)

    def step(state: TrainState, batch, key: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        return state.apply_gradients(grads), loss

    return jax.jit(step, **_shard_args(mesh))


def make_clf_train_step(module, sigmas: jnp.ndarray,
                        mesh: Optional[Mesh] = None,
                        compute_dtype=None,
                        data_mode: str = "real-valued"):
    """Noise-robust classifier step (reference: helpers/pl_helpers.py:190-246,
    ncsn/losses/clf_loss.py). batch = (X, y). data_mode collates X before
    the loss, as TrainClf does (pl_helpers.py:212) — single-tensor modes
    only (a 'real-imag' Re/Im pair has no single class target)."""
    sigmas = jnp.asarray(sigmas)
    apply_fn = _mixed_precision_apply(module, compute_dtype)

    def loss_fn(params, batch, key):
        X, y = batch
        key_collate, key = jax.random.split(key)
        X = collate_batch(X, data_mode, key_collate)
        assert not isinstance(X, list), \
            f"clf training needs a single-tensor data_mode, not {data_mode!r}"
        clf_fn = lambda x: apply_fn(params, x)
        loss, logits = clf_loss_with_perturbation(clf_fn, X, y, sigmas, key)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, acc

    def step(state: TrainState, batch, key: jax.Array):
        (loss, _acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        return state.apply_gradients(grads), loss

    kw = _shard_args(mesh)
    return jax.jit(step, **kw)


def make_seg_train_step(module, sigmas: jnp.ndarray,
                        perturb: bool = False,
                        mesh: Optional[Mesh] = None,
                        compute_dtype=None,
                        if_centering: bool = False,
                        data_mode: str = "real-valued"):
    """Segmentation (DiceCE) step (reference: helpers/pl_helpers.py:264-352,
    ncsn/losses/seg_loss.py). batch = (X, y_mask). if_centering applies the
    reference's optional 2X-1 shift (train_seg.py:26); data_mode collates X
    after centering (pl_helpers.py:290-296 — Re/Im modes average the two
    part losses under the shared label)."""
    sigmas = jnp.asarray(sigmas)
    apply_fn = _mixed_precision_apply(module, compute_dtype)

    def loss_fn(params, batch, key):
        X, y = batch
        if if_centering:
            X = 2.0 * X - 1.0
        key_collate, key = jax.random.split(key)
        Xc = collate_batch(X, data_mode, key_collate)
        seg_fn = lambda x: apply_fn(params, x)
        if isinstance(Xc, list):
            k_re, k_im = jax.random.split(key)
            loss_re, _ = seg_loss_with_perturbation(seg_fn, Xc[0], y, sigmas,
                                                    k_re, perturb=perturb)
            loss_im, _ = seg_loss_with_perturbation(seg_fn, Xc[1], y, sigmas,
                                                    k_im, perturb=perturb)
            loss = 0.5 * (loss_re + loss_im)
        else:
            loss, _ = seg_loss_with_perturbation(seg_fn, Xc, y, sigmas, key,
                                                 perturb=perturb)
        return loss

    def step(state: TrainState, batch, key: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        return state.apply_gradients(grads), loss

    return jax.jit(step, **_shard_args(mesh))


def make_score_eval_step(module, sigmas: jnp.ndarray,
                         data_mode: str = "real-valued",
                         anneal_power: float = 2.0,
                         use_ema: bool = True,
                         if_centering: bool = False):
    """Validation DSM loss on EMA params (the reference swaps EMA weights in
    around validation, helpers/pl_callbacks.py:87-108)."""
    sigmas = jnp.asarray(sigmas)

    @jax.jit
    def step(state: TrainState, batch: jnp.ndarray, key: jax.Array):
        params = state.eval_params if use_ema else state.params

        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])

        key_collate, key_dsm = jax.random.split(key)
        if if_centering:
            batch = 2.0 * batch - 1.0
        parts = collate_batch(batch, data_mode, key_collate)
        x = stack_parts(*parts) if isinstance(parts, list) else parts
        return anneal_dsm_score_estimation(score_fn, x, sigmas, key_dsm,
                                           anneal_power=anneal_power)

    return step
