"""Train state: params + optimizer + EMA as one pytree.

Replaces the reference's Lightning module/optimizer pair plus the EMA
callback's shadow state dict (reference: helpers/pl_helpers.py:99-143,
helpers/pl_callbacks.py:22-121). Keeping EMA inside the state means one
donated pytree per step and orbax checkpoints capture {params, ema,
opt_state, step} atomically — the reference instead fishes
`callbacks.EMA.ema_state_dict` out of Lightning checkpoints
(helpers/load_model.py:179-184).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.ema import EmaState

PyTree = Any


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: PyTree
    opt_state: optax.OptState
    ema: Optional[EmaState]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: PyTree, tx: optax.GradientTransformation,
               ema_decay: Optional[float] = 0.999,
               ema_warmup: bool = False) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema=(EmaState.create(params, ema_decay, ema_warmup)
                 if ema_decay is not None else None),
            tx=tx,
        )

    def apply_gradients(self, grads: PyTree) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema.update(new_params) if self.ema is not None else None
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema=new_ema)

    @property
    def eval_params(self) -> PyTree:
        """EMA params if tracked, else raw params — what sampling should use
        (the reference reloads EMA weights, helpers/load_model.py:181-184)."""
        return self.ema.params if self.ema is not None else self.params


def _decay_mask(params):
    """Weight-decay mask: True everywhere except frozen params (the
    GaussianFourierProjection random matrix, which the reference excludes
    from the optimizer via requires_grad=False)."""
    def keep(path, _):
        return not any(
            str(getattr(k, "key", "")).startswith("GaussianFourierProjection")
            for k in path)
    return jax.tree_util.tree_map_with_path(keep, params)


def get_optimizer(config) -> optax.GradientTransformation:
    """Adam / RMSProp / SGD from config.optim
    (reference: ncsn/losses/__init__.py:3-13, helpers/utils.py:194-209)."""
    opt = config.optim
    name = opt.get("optimizer", "Adam")
    lr = opt.lr
    wd = opt.get("weight_decay", 0.0)
    if name == "Adam":
        tx = optax.adam(lr, b1=opt.get("beta1", 0.9), eps=opt.get("eps", 1e-8))
    elif name == "RMSProp":
        # torch RMSprop defaults: alpha=0.99, eps OUTSIDE the sqrt
        tx = optax.rmsprop(lr, decay=0.99, eps=opt.get("eps", 1e-8),
                           eps_in_sqrt=False)
    elif name == "SGD":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise NotImplementedError(f"optimizer {name} not supported")
    if wd:
        # torch folds weight_decay into the gradient BEFORE the moment
        # updates (L2, not decoupled AdamW) for all three optimizers.
        # Frozen params are EXCLUDED: GaussianFourierProjection.W is
        # requires_grad=False in the reference (models/layerspp.py:32-40),
        # so torch's optimizer never decays it; stop_gradient alone only
        # zeroes its gradient, and an unmasked decay would shrink the
        # frozen projection every step.
        tx = optax.chain(optax.add_decayed_weights(wd, mask=_decay_mask), tx)
    # reference configs disable clipping with grad_clip = -1 (e.g.
    # configs/ve/ncsn/cifar10.py:55) or 0
    if opt.get("grad_clip", 0.0) > 0:
        tx = optax.chain(optax.clip_by_global_norm(opt.grad_clip), tx)
    return tx
