"""Training loop: epochs over a host data iterator, jitted sharded steps,
EMA-weighted validation, periodic checkpointing and sample visualization.

Replaces Lightning `Trainer` + callbacks (reference:
helpers/pl_helpers.py:355-399 `get_score_model_trainer`,
helpers/pl_callbacks.py:153-178 `ValVisualizationDiscrete`). Logging is a
JSONL metrics stream (one line per event) instead of TensorBoard — cheap,
greppable, and no host-side dependency in the hot loop.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .state import TrainState
from .checkpoint import Checkpointer


class MetricsLogger:
    """Append-only JSONL scalar log (timestamp, step, **scalars).

    tensorboard=True additionally mirrors every scalar to a TB event file
    under `<log_dir>/tb` (utils/tb_export.TBMirror) — dashboard parity
    with the reference's SummaryWriter logging (helpers/pl_helpers.py:361).
    Existing jsonl runs convert after the fact with
    `scripts/export_tensorboard.py`."""

    def __init__(self, log_dir: str, name: str = "metrics.jsonl",
                 tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, name)
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from ..utils.tb_export import TBMirror
            self._tb = TBMirror(os.path.join(log_dir, "tb"))

    def log(self, step: int, **scalars: float) -> None:
        rec = {"ts": time.time(), "step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add(step, walltime=rec["ts"],
                         **{k: v for k, v in rec.items()
                            if k not in ("ts", "step")})

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@dataclass
class FitConfig:
    n_epochs: int = 1
    max_steps: Optional[int] = None            # debug cap (reference
    # fast_dev_run, helpers/pl_helpers.py:379-384)
    log_every: int = 50
    ckpt_every_epochs: int = 1
    seed: int = 42
    log_dir: str = "runs/default"
    keep_ckpts: int = 3
    resume: bool = True       # restore the latest checkpoint if one exists
    tensorboard: bool = False  # mirror scalars to <log_dir>/tb events


def fit(
    state: TrainState,
    train_step: Callable,
    train_iter_fn: Callable[[], Iterable[Any]],
    cfg: FitConfig,
    eval_step: Optional[Callable] = None,
    val_iter_fn: Optional[Callable[[], Iterable[Any]]] = None,
    epoch_end_hook: Optional[Callable[[TrainState, int], None]] = None,
) -> TrainState:
    """Run the epoch loop.

    train_iter_fn(): fresh iterable of batches per epoch (host numpy ok).
    train_step(state, batch, key) -> (state, loss); eval_step likewise
    returning a scalar loss on EMA weights. epoch_end_hook can render samples
    (the ValVisualization analog) — it runs outside the jitted path.
    """
    key = jax.random.PRNGKey(cfg.seed)
    logger = MetricsLogger(cfg.log_dir, tensorboard=cfg.tensorboard)
    ckpt = Checkpointer(os.path.join(cfg.log_dir, "ckpts"),
                        max_to_keep=cfg.keep_ckpts,
                        track_best=eval_step is not None)
    if cfg.resume and ckpt.latest_step() is not None:
        # elastic restart: resume {params, ema, opt_state, step} from the
        # latest checkpoint (the reference relies on Lightning ckpts only)
        state = ckpt.restore(state)
        logger.log(int(state.step), resumed=1.0)
    global_step = int(state.step)
    resumed_step = global_step
    if resumed_step:
        # fresh randomness after a restart: fold the restored step into the
        # stream so a resumed run does not replay the exact noise/label
        # draws (and batch keys) the crashed run already consumed
        key = jax.random.fold_in(key, resumed_step)
    t0 = time.time()
    stop = False

    # Epochs completed across restarts: the checkpoint stores only the step
    # count, so after the first in-session epoch (when batches/epoch is
    # known) the counter is re-based to resumed_step // batches_per_epoch —
    # a resumed run finishes the REMAINING epochs instead of restarting the
    # epoch budget, and epoch-indexed hooks/artifacts keep monotonic names.
    epoch = 0
    batches_per_epoch = None
    while epoch < cfg.n_epochs and not stop:
        n_batches = 0
        for batch in train_iter_fn():
            key, k_step = jax.random.split(key)
            state, loss = train_step(state, batch, k_step)
            global_step += 1
            n_batches += 1
            if global_step % cfg.log_every == 0:
                loss_v = float(jax.device_get(loss))
                logger.log(global_step, train_loss=loss_v,
                           steps_per_sec=cfg.log_every / max(
                               time.time() - t0, 1e-9))
                t0 = time.time()
            if cfg.max_steps and global_step >= cfg.max_steps:
                stop = True
                break
        if batches_per_epoch is None and n_batches > 0 and not stop:
            # rebase only off a FULL epoch: when max_steps stops the run
            # mid-first-epoch, n_batches is a partial count and would
            # inflate the rebased epoch index
            batches_per_epoch = n_batches
            epoch += resumed_step // batches_per_epoch

        val_loss = None
        if eval_step is not None and val_iter_fn is not None:
            losses = []
            for vbatch in val_iter_fn():
                key, k_val = jax.random.split(key)
                losses.append(float(jax.device_get(
                    eval_step(state, vbatch, k_val))))
            if losses:
                val_loss = float(np.mean(losses))
                logger.log(global_step, val_loss=val_loss, epoch=epoch)

        if (epoch + 1) % cfg.ckpt_every_epochs == 0 or stop:
            ckpt.save(global_step, state, val_loss=val_loss)
        if epoch_end_hook is not None:
            epoch_end_hook(state, epoch)
        epoch += 1

    ckpt.close()
    logger.close()
    return state


def make_train_iterator(data: np.ndarray, batch_size: int, *,
                        shuffle: bool = True, seed: int = 0,
                        drop_last: bool = True, prefer_native: bool = True):
    """Training feed factory: the C++ prefetch batcher
    (native/batcher.cpp via data/native_loader.py — the reference's
    DataLoader num_workers analog, helpers/pl_helpers.py:115) when it
    builds on this host, else the numpy iterator. Unlabeled float arrays
    only; labeled feeds use `batch_iterator(labels=...)`."""
    if prefer_native:
        try:
            from ..data.native_loader import (native_available,
                                              native_batch_iterator)
            if native_available():
                return native_batch_iterator(
                    np.asarray(data), batch_size, shuffle=shuffle,
                    seed=seed, drop_last=drop_last)
        except Exception:
            pass  # fall through to the numpy path
    return batch_iterator(data, batch_size, shuffle=shuffle, seed=seed,
                          drop_last=drop_last)


def batch_iterator(data: np.ndarray, batch_size: int, *, labels=None,
                   shuffle: bool = True, seed: int = 0, drop_last: bool = True):
    """Simple host-side epoch iterator factory over in-memory arrays."""
    rng = np.random.RandomState(seed)

    def make():
        n = data.shape[0]
        idx = rng.permutation(n) if shuffle else np.arange(n)
        end = n - (n % batch_size) if drop_last else n
        for i in range(0, max(end, batch_size) if not drop_last else end,
                       batch_size):
            sel = idx[i:i + batch_size]
            if len(sel) == 0:
                continue
            if labels is not None:
                yield data[sel], labels[sel]
            else:
                yield data[sel]

    return make
