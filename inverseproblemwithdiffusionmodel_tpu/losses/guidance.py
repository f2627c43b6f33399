"""Noise-robust classifier / segmentation losses used for guided sampling.

Reference semantics: ncsn/losses/clf_loss.py:5-20 (CE on sigma-perturbed
inputs) and ncsn/losses/seg_loss.py:7-37 (Dice + CE, shared noise label per
batch; the reference disables the perturbation for seg - we keep it optional).
Channel-last conventions: images (B, H, W, C); seg labels (B, H, W) int;
seg logits (B, H, W, num_cls); clf logits (B, num_cls).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _perturb(X: jnp.ndarray, sigmas: jnp.ndarray, labels: jnp.ndarray,
             key: jax.Array) -> jnp.ndarray:
    used = sigmas[labels].reshape(X.shape[0], *([1] * (X.ndim - 1)))
    return X + jax.random.normal(key, X.shape, X.dtype) * used


def clf_loss_with_perturbation(
    clf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    X: jnp.ndarray,
    y: jnp.ndarray,
    sigmas: jnp.ndarray,
    key: jax.Array,
    labels: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-entropy on sigma-perturbed inputs. Returns (loss, logits)."""
    key_l, key_n = jax.random.split(key)
    if labels is None:
        labels = jax.random.randint(key_l, (X.shape[0],), 0, sigmas.shape[0])
    X_perturbed = _perturb(X, sigmas, labels, key_n)
    logits = clf_fn(X_perturbed)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
    return loss, logits


def dice_ce_loss(
    logits: jnp.ndarray,
    y: jnp.ndarray,
    include_background: bool = False,
    squared_pred: bool = True,
    lambda_ce: float = 0.5,
    lambda_dice: float = 0.5,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Dice + cross-entropy, matching MONAI DiceCELoss(include_background=False,
    softmax=True, squared_pred=True, batch=True) as configured at
    ncsn/losses/seg_loss.py:24-32.

    logits: (B, H, W, K); y: (B, H, W) int labels.
    """
    num_cls = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(y, num_cls, dtype=logits.dtype)

    # cross entropy (mean over batch & pixels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.sum(onehot * logp, axis=-1))

    # dice with batch=True: reduce over batch + spatial jointly per class
    start = 0 if include_background else 1
    p = probs[..., start:]
    g = onehot[..., start:]
    reduce_axes = tuple(range(p.ndim - 1))  # all but class axis
    intersection = jnp.sum(p * g, axis=reduce_axes)
    if squared_pred:
        denom = jnp.sum(p**2, axis=reduce_axes) + jnp.sum(g**2, axis=reduce_axes)
    else:
        denom = jnp.sum(p, axis=reduce_axes) + jnp.sum(g, axis=reduce_axes)
    dice = 1.0 - jnp.mean((2.0 * intersection + eps) / (denom + eps))

    return lambda_ce * ce + lambda_dice * dice


def seg_loss_with_perturbation(
    seg_fn: Callable[[jnp.ndarray], jnp.ndarray],
    X: jnp.ndarray,
    y: jnp.ndarray,
    sigmas: jnp.ndarray,
    key: jax.Array,
    labels: Optional[jnp.ndarray] = None,
    perturb: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DiceCE segmentation loss; a single shared noise level per batch.

    The reference currently disables the input perturbation
    (seg_loss.py:20 `X_perturbed = X`); `perturb=True` re-enables it.
    """
    key_l, key_n = jax.random.split(key)
    if labels is None:
        shared = jax.random.randint(key_l, (1,), 0, sigmas.shape[0])
        labels = jnp.broadcast_to(shared, (X.shape[0],))
    X_in = _perturb(X, sigmas, labels, key_n) if perturb else X
    logits = seg_fn(X_in)
    loss = dice_ce_loss(logits, y)
    return loss, logits
