"""Denoising score-matching losses.

- `anneal_dsm_score_estimation`: discrete annealed DSM over a sigma ladder
  (reference semantics: ncsn/losses/dsm.py:3-19).
- `continuous_dsm_loss`: continuous-time DSM against an SDE's marginal
  (reference semantics: helpers/losses.py:7-24).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _expand(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """(B,) -> (B, 1, ..., 1) matching `like`'s rank."""
    return v.reshape(v.shape[0], *([1] * (like.ndim - 1)))


def anneal_dsm_score_estimation(
    score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    samples: jnp.ndarray,
    sigmas: jnp.ndarray,
    key: jax.Array,
    labels: Optional[jnp.ndarray] = None,
    anneal_power: float = 2.0,
    sample_weight: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Discrete annealed DSM loss.

    score_fn(x, labels) -> score; samples: (B, *feature); sigmas: (L,).
    Perturb with sigma[labels], target -noise / sigma^2, weight
    sigma^anneal_power. `sample_weight` (B,) re-weights per-sample losses —
    the jit-safe form of the reference's TV-based 1-D foreground filtering
    (helpers/load_data.py:417-440 drops rows; dropping changes shapes, a
    weight of 0 has the identical expected gradient). `noise` injects the
    standard-normal draw (pre sigma-scaling) for deterministic oracle tests
    against the reference loss (ncsn/losses/dsm.py:9).
    """
    key_labels, key_noise = jax.random.split(key)
    if labels is None:
        labels = jax.random.randint(key_labels, (samples.shape[0],), 0, sigmas.shape[0])
    used_sigmas = _expand(sigmas[labels], samples)
    if noise is None:
        noise = jax.random.normal(key_noise, samples.shape, samples.dtype)
    noise = noise * used_sigmas
    perturbed = samples + noise
    target = -noise / used_sigmas**2
    scores = score_fn(perturbed, labels)
    sq = jnp.sum(
        (scores - target).reshape(samples.shape[0], -1) ** 2, axis=-1)
    loss = 0.5 * sq * sigmas[labels] ** anneal_power
    if sample_weight is not None:
        return jnp.sum(loss * sample_weight) / jnp.maximum(
            jnp.sum(sample_weight), 1e-12)
    return loss.mean()


def continuous_dsm_loss(
    score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sde,
    samples: jnp.ndarray,
    key: jax.Array,
    eps: float = 1e-5,
    reduce_mean: bool = True,
) -> jnp.ndarray:
    """Continuous DSM with t ~ U(eps, T).

    reduce_mean=True: E || s(x_t, t) + z / std ||^2 — the reference's actual
    training loss (helpers/losses.py:7-24, mean over features and batch;
    note its commented-out `(score*std + Z)**2` alternative at :21).
    reduce_mean=False: score_sde's unweighted convention the VE config tree
    names (training.reduce_mean=False, configs/ve/*): mean over the batch of
    0.5 * per-sample-sum of (score * std + z)^2 — i.e. the lambda(t)=sigma^2
    weighting that makes every noise level contribute equally, NOT just a
    different reduction of the same integrand."""
    key_t, key_z = jax.random.split(key)
    t = jax.random.uniform(key_t, (samples.shape[0],), samples.dtype) * (sde.T - eps) + eps
    z = jax.random.normal(key_z, samples.shape, samples.dtype)
    mean, std = sde.marginal_prob(samples, t)
    std = _expand(std, z)
    perturbed = mean + z * std
    score = score_fn(perturbed, t)
    if reduce_mean:
        return jnp.mean((score + z / std) ** 2)
    sq = (score * std + z) ** 2
    return jnp.mean(0.5 * jnp.sum(sq.reshape(sq.shape[0], -1), axis=-1))
