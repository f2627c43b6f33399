"""Train the noise-robust classifier (guided sampling prior).

Reference: scripts/train_clf.py — TrainClf Lightning module with
clf_loss_with_perturbation (ncsn/losses/clf_loss.py).
"""
from __future__ import annotations

import argparse
import os

from ..config import load_config
from ..data import load_data
from ..models.registry import build_clf
from ..samplers.sigmas import get_sigmas
from ..training import (TrainState, get_optimizer, make_clf_train_step,
                        FitConfig, fit, batch_iterator)
import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ds_name", default="MNIST")
    p.add_argument("--task_name", default="Clf", choices=["Clf"])
    p.add_argument("--mode", default="real-valued",
                   help="data mode collated before the clf loss "
                        "(reference TrainClf, pl_helpers.py:212); "
                        "single-tensor modes (real-valued|mag)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--n_epochs", type=int, default=None)
    p.add_argument("--train_mode", default="normal", choices=["normal", "debug"])
    p.add_argument("--log_dir", default="runs")
    p.add_argument("--data_root", default=None)
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference CLI compatibility; "
                        "unused — the C++ prefetch batcher replaces "
                        "torch DataLoader workers")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    config = load_config(args.ds_name, args.mode)
    batch_size = args.batch_size or config.training.get("clf_batch_size", 64)
    n_epochs = args.n_epochs or 10
    max_steps = 2 if args.train_mode == "debug" else None

    kw = {"root_dir": args.data_root} if args.data_root else {}
    train_ds = load_data(args.ds_name, "train", **kw)

    module = build_clf()
    x0 = jnp.zeros((1, config.data.image_size, config.data.image_size,
                    config.data.channels))
    # jitted init: eager per-op dispatch is minutes-slow on remote
    # backends (CLAUDE.md)
    params = jax.jit(module.init)(jax.random.PRNGKey(args.seed),
                                  x0)["params"]
    sigmas = get_sigmas(config)
    state = TrainState.create(params, get_optimizer(config), ema_decay=None)
    step = make_clf_train_step(module, sigmas, data_mode=args.mode)

    log_dir = os.path.join(args.log_dir, f"{args.ds_name}_Clf")
    cfg = FitConfig(n_epochs=n_epochs, max_steps=max_steps, log_dir=log_dir,
                    seed=args.seed)
    state = fit(state, step,
                batch_iterator(train_ds.data, batch_size,
                               labels=train_ds.labels, seed=args.seed), cfg)
    print(f"done: {int(state.step)} steps; ckpts under "
          f"{os.path.join(log_dir, 'ckpts')}")
    return state


if __name__ == "__main__":
    main()
