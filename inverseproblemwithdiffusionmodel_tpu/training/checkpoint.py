"""Orbax checkpointing: {params, ema, opt_state, step} saved atomically.

Replaces the reference's Lightning `ModelCheckpoint(monitor="val_loss")` +
EMA-state-inside-callback scheme (helpers/pl_helpers.py:362-366,
helpers/pl_callbacks.py:110-121) and the hard-coded timestamp registry
resolution at reload time (helpers/load_model.py:42-122, 146-186).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3,
             best_mode: Optional[str] = "min") -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        best_fn=(lambda m: m["val_loss"]) if best_mode else None,
        best_mode=best_mode or "min",
        create=True,
    )
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


class Checkpointer:
    """Thin wrapper: save/restore a TrainState pytree with a val-loss-best
    retention policy (the reference monitors val_loss the same way)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3,
                 track_best: bool = True):
        self.manager = _manager(ckpt_dir, max_to_keep,
                                "min" if track_best else None)

    def save(self, step: int, state: Any,
             val_loss: Optional[float] = None) -> None:
        metrics = {"val_loss": float(val_loss)} if val_loss is not None else None
        self.manager.save(step, args=ocp.args.StandardSave(state),
                          metrics=metrics)
        self.manager.wait_until_finished()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like` (an abstract or concrete
        TrainState). step=None -> latest."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        state_like)
        return self.manager.restore(step,
                                    args=ocp.args.StandardRestore(target))

    def restore_params(self, step: Optional[int] = None,
                       use_ema: bool = True):
        """Structure-agnostic restore of just the (EMA) params: reads the
        raw saved pytree with NO TrainState template, so checkpoints
        written with a different optimizer wrapping (optax.MultiSteps) or
        without EMA tracking (clf/seg trainers use ema_decay=None) load
        fine. Returns (params, step). Falls back to the raw params when
        the checkpoint carries no EMA shadow."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        raw = self.manager.restore(step)
        params = None
        if use_ema:
            ema = raw.get("ema") if hasattr(raw, "get") else None
            if ema is not None and hasattr(ema, "get"):
                params = ema.get("params")
        if params is None:
            params = raw["params"]
        saved_step = raw.get("step", step) if hasattr(raw, "get") else step
        return params, int(saved_step)

    def best_step(self) -> Optional[int]:
        return self.manager.best_step()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self):
        self.manager.close()
