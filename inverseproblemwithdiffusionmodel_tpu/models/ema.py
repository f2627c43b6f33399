"""Exponential moving average of parameters as a pure pytree transform.

Replaces both the reference's Lightning `EMA` callback
(helpers/pl_callbacks.py:79-84: shadow <- d * shadow + (1 - d) * w) and the
functional `ExponentialMovingAverage` with num_updates warm-up
(models/ema.py:15-95: decay <- min(decay, (1 + n) / (10 + n))).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

PyTree = Any


class EmaState(struct.PyTreeNode):
    decay: float = struct.field(pytree_node=False)
    params: PyTree = None
    num_updates: Optional[jnp.ndarray] = None  # None disables warm-up

    @classmethod
    def create(cls, params: PyTree, decay: float, use_warmup: bool = False) -> "EmaState":
        # Copy (not alias) the buffers: TrainState donates its whole pytree
        # per step, and donating the same underlying buffer twice (params +
        # ema.params) is a runtime error.
        return cls(
            decay=decay,
            params=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True),
                                          params),
            num_updates=jnp.zeros((), jnp.int32) if use_warmup else None,
        )

    def update(self, new_params: PyTree) -> "EmaState":
        if self.num_updates is not None:
            n = self.num_updates + 1
            decay = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        else:
            n = None
            decay = self.decay
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, self.params, new_params)
        return self.replace(params=ema, num_updates=n)
