"""Train the ACDC myocardium segmentation UNet (guidance prior).

Reference: scripts/train_seg.py — TrainSeg Lightning module with DiceCE
(ncsn/losses/seg_loss.py).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..config import load_config
from ..data import load_data
from ..models.registry import build_seg_unet
from ..samplers.sigmas import get_sigmas
from ..training import (TrainState, get_optimizer, make_seg_train_step,
                        FitConfig, fit, batch_iterator)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ds_name", default="ACDC")
    p.add_argument("--task_name", default="Seg", choices=["Seg"])
    p.add_argument("--mode", default="real-valued",
                   help="data mode collated before the seg loss "
                        "(reference TrainSeg, pl_helpers.py:290; Re/Im "
                        "modes average the part losses)")
    p.add_argument("--if_centering", action="store_true",
                   help="center inputs to [-1, 1] before the loss "
                        "(reference train_seg.py:26)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--n_epochs", type=int, default=None)
    p.add_argument("--train_mode", default="normal", choices=["normal", "debug"])
    p.add_argument("--log_dir", default="runs")
    p.add_argument("--data_root", default=None)
    p.add_argument("--perturb", action="store_true",
                   help="re-enable input noising (reference disables it, "
                        "seg_loss.py:20)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference CLI compatibility; "
                        "unused — the C++ prefetch batcher replaces "
                        "torch DataLoader workers")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    config = load_config(args.ds_name, args.mode)
    batch_size = args.batch_size or config.training.get("seg_batch_size", 8)
    n_epochs = args.n_epochs or 10
    max_steps = 2 if args.train_mode == "debug" else None

    kw = {"root_dir": args.data_root} if args.data_root else {}
    kw["image_size"] = config.data.image_size
    train_ds = load_data(args.ds_name, "train", **kw)

    module = build_seg_unet()
    x0 = jnp.zeros((1, config.data.image_size, config.data.image_size,
                    config.data.channels))
    # jitted init: eager per-op dispatch is minutes-slow on remote
    # backends (CLAUDE.md)
    params = jax.jit(module.init)(jax.random.PRNGKey(args.seed),
                                  x0)["params"]
    sigmas = get_sigmas(config)
    state = TrainState.create(params, get_optimizer(config), ema_decay=None)
    step = make_seg_train_step(module, sigmas, perturb=args.perturb,
                               if_centering=args.if_centering,
                               data_mode=args.mode)

    log_dir = os.path.join(args.log_dir, f"{args.ds_name}_Seg")
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
