"""Normalization layers for the NCSN score networks, rank-generic.

Reference semantics: ncsn/models/normalization.py (and its 1d/3d copies -
here a single implementation covers all ranks; spatial axes are
1..ndim-2 of channel-last tensors).

InstanceNorm++ (the default, `normalization: InstanceNorm++` in every
config) is InstanceNorm with the batch-normalized per-channel means
re-injected through a learned alpha - the exact numerics
(normalization.py:150-177): instance statistics use biased variance with
eps=1e-5; the mean-of-means statistics use the UNBIASED variance over the
channel axis (torch.var default).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def normal_init(mean: float, std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


def _spatial_axes(x: jnp.ndarray) -> tuple:
    return tuple(range(1, x.ndim - 1))


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel standardization over spatial dims
    (biased variance, like torch InstanceNormNd(affine=False))."""
    axes = _spatial_axes(x)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class InstanceNormPlus(nn.Module):
    """InstanceNorm++ (reference: normalization.py:150-177)."""
    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = _spatial_axes(x)
        means = jnp.mean(x, axis=axes)                      # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)         # (B, 1)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)  # unbiased (torch.var)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)       # (B, C)
        h = _instance_norm(x)

        alpha = self.param("alpha", normal_init(1.0, 0.02), (self.num_features,))
        gamma = self.param("gamma", normal_init(1.0, 0.02), (self.num_features,))
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_features,)
        h = h + means_norm.reshape(shape) * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.num_features,))
            out = out + beta
        return out


class ConditionalInstanceNormPlus(nn.Module):
    """Class-conditional InstanceNorm++ (reference: normalization.py:179-208):
    per-class gamma/alpha ~ N(1, 0.02) embeddings, beta zeros."""
    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        axes = _spatial_axes(x)
        means = jnp.mean(x, axis=axes)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)
        h = _instance_norm(x)

        gamma_e = self.param("gamma_embed", normal_init(1.0, 0.02),
                             (self.num_classes, self.num_features))
        alpha_e = self.param("alpha_embed", normal_init(1.0, 0.02),
                             (self.num_classes, self.num_features))
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_features,)
        h = h + means_norm.reshape(shape) * alpha_e[y].reshape(shape)
        out = gamma_e[y].reshape(shape) * h
        if self.bias:
            beta_e = self.param("beta_embed", nn.initializers.zeros,
                                (self.num_classes, self.num_features))
            out = out + beta_e[y].reshape(shape)
        return out


class InstanceNorm(nn.Module):
    """Plain InstanceNorm (affine=False), reference: torch InstanceNorm2d."""
    num_features: int
    bias: bool = True  # unused; kept for ctor uniformity

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _instance_norm(x)


class VarianceNorm(nn.Module):
    """Variance-only normalization (reference: normalization.py:103-116)."""
    num_features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = _spatial_axes(x)
        vars_ = jnp.var(x, axis=axes, keepdims=True)
        h = x / jnp.sqrt(vars_ + 1e-5)
        alpha = self.param("alpha", normal_init(1.0, 0.02), (self.num_features,))
        return alpha * h


class NoneNorm(nn.Module):
    num_features: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


class BatchNorm(nn.Module):
    """BatchNorm wrapper; requires a `batch_stats` mutable collection when
    training (use_running_average toggled via module attr)."""
    num_features: int
    bias: bool = True
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.BatchNorm(use_running_average=self.use_running_average)(x)


class ConditionalInstanceNorm(nn.Module):
    """Class-conditional InstanceNorm: per-class gamma (and beta)
    embeddings on top of affine-free instance stats
    (reference: normalization.py:77-101)."""
    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = _instance_norm(x)
        gamma_e = self.param("gamma_embed", normal_init(1.0, 0.02),
                             (self.num_classes, self.num_features))
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_features,)
        out = gamma_e[y].reshape(shape) * h
        if self.bias:
            beta_e = self.param("beta_embed", nn.initializers.zeros,
                                (self.num_classes, self.num_features))
            out = out + beta_e[y].reshape(shape)
        return out


class ConditionalVarianceNorm(nn.Module):
    """Class-conditional variance normalization
    (reference: normalization.py:43-60)."""
    num_features: int
    num_classes: int
    bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        axes = _spatial_axes(x)
        vars_ = jnp.var(x, axis=axes, keepdims=True)
        h = x / jnp.sqrt(vars_ + 1e-5)
        alpha_e = self.param("alpha_embed", normal_init(1.0, 0.02),
                             (self.num_classes, self.num_features))
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_features,)
        return alpha_e[y].reshape(shape) * h


class ConditionalNoneNorm(nn.Module):
    """Class-conditional affine with no normalization
    (reference: normalization.py:122-147)."""
    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        gamma_e = self.param("gamma_embed", normal_init(1.0, 0.02),
                             (self.num_classes, self.num_features))
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_features,)
        out = gamma_e[y].reshape(shape) * x
        if self.bias:
            beta_e = self.param("beta_embed", nn.initializers.zeros,
                                (self.num_classes, self.num_features))
            out = out + beta_e[y].reshape(shape)
        return out


_NORMS = {
    "InstanceNorm++": InstanceNormPlus,
    "InstanceNorm": InstanceNorm,
    "VarianceNorm": VarianceNorm,
    "NoneNorm": NoneNorm,
    "BatchNorm": BatchNorm,
}

_COND_NORMS = {
    "InstanceNorm++": ConditionalInstanceNormPlus,
    "InstanceNorm": ConditionalInstanceNorm,
    "VarianceNorm": ConditionalVarianceNorm,
    "NoneNorm": ConditionalNoneNorm,
}


def get_normalization(config, conditional: bool = False):
    """Dispatch by config.model.normalization
    (reference: normalization.py:5-34)."""
    name = config.model.normalization
    if conditional:
        if name not in _COND_NORMS:
            raise NotImplementedError(f"conditional {name} not implemented")
        return _COND_NORMS[name]
    if name not in _NORMS:
        raise NotImplementedError(f"{name} does not exist!")
    return _NORMS[name]
