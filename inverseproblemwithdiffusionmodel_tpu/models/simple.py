"""Toy time-conditioned score UNet for tutorials / smoke tests.

Reference semantics: models/simple_model.py:9-130 — GaussianFourierProjection
time embedding, 4-level conv encoder/decoder with Dense time injections and
GroupNorm, output divided by the marginal std.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layerspp import GaussianFourierProjection


class ScoreNet(nn.Module):
    """Simple score model s(x, t) (reference: models/simple_model.py:25-130).

    marginal_prob_std: t -> std of p_t (e.g. VESDE sigma(t)).
    """
    marginal_prob_std: Callable[[jnp.ndarray], jnp.ndarray]
    channels: Sequence[int] = (32, 64, 128, 256)
    embed_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        act = lambda v: v * nn.sigmoid(v)  # swish
        embed = GaussianFourierProjection(
            embedding_size=self.embed_dim // 2, name="embed")(t)
        embed = act(nn.Dense(self.embed_dim, name="embed_dense")(embed))

        def dense_t(features, name):
            return nn.Dense(features, name=name)(embed)[:, None, None, :]

        c1, c2, c3, c4 = self.channels
        h1 = nn.Conv(c1, (3, 3), use_bias=False, name="conv1")(x)
        h1 = act(nn.GroupNorm(4, name="gn1")(h1 + dense_t(c1, "d1")))
        h2 = nn.Conv(c2, (3, 3), (2, 2), use_bias=False, name="conv2")(h1)
        h2 = act(nn.GroupNorm(min(32, c2), name="gn2")(h2 + dense_t(c2, "d2")))
        h3 = nn.Conv(c3, (3, 3), (2, 2), use_bias=False, name="conv3")(h2)
        h3 = act(nn.GroupNorm(min(32, c3), name="gn3")(h3 + dense_t(c3, "d3")))
        h4 = nn.Conv(c4, (3, 3), (2, 2), use_bias=False, name="conv4")(h3)
        h4 = act(nn.GroupNorm(min(32, c4), name="gn4")(h4 + dense_t(c4, "d4")))

        h = nn.ConvTranspose(c3, (3, 3), (2, 2), use_bias=False,
                             name="tconv4")(h4)
        h = act(nn.GroupNorm(min(32, c3), name="tgn4")(h + dense_t(c3, "td4")))
        h = nn.ConvTranspose(c2, (3, 3), (2, 2), use_bias=False,
                             name="tconv3")(jnp.concatenate([h, h3], -1))
        h = act(nn.GroupNorm(min(32, c2), name="tgn3")(h + dense_t(c2, "td3")))
        h = nn.ConvTranspose(c1, (3, 3), (2, 2), use_bias=False,
                             name="tconv2")(jnp.concatenate([h, h2], -1))
        h = act(nn.GroupNorm(min(32, c1), name="tgn2")(h + dense_t(c1, "td2")))
        h = nn.ConvTranspose(x.shape[-1], (3, 3), name="tconv1")(
            jnp.concatenate([h, h1], -1))

        std = self.marginal_prob_std(t)
        return h / std.reshape(-1, *([1] * (h.ndim - 1)))
