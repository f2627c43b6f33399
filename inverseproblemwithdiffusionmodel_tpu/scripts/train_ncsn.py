"""Train a discrete NCSN score model (2D / 1D / 3D).

Reference: scripts/train_ncsn.py — load_config -> load_data -> load_model ->
TrainScoreModelDiscrete + EMA callback -> trainer.fit. Here: jitted sharded
DSM train step + EMA-in-state + orbax checkpoints + JSONL metrics.

  python -m inverseproblemwithdiffusionmodel_tpu.scripts.train_ncsn \
      --ds_name MNIST --task_name Diffusion --mode real-imag
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..data import load_data
from ..models.registry import load_model
from ..parallel import make_mesh
from ..samplers.sigmas import get_sigmas
from ..training import (TrainState, get_optimizer, make_score_train_step,
                        make_score_eval_step, FitConfig, fit, batch_iterator,
                        make_train_iterator)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ds_name", required=True)
    p.add_argument("--task_name", default="Diffusion",
                   choices=["Diffusion", "Diffusion1D", "Diffusion3D"])
    p.add_argument("--mode", default="real-valued",
                   help="data mode: real-valued|mag|complex|real-imag|"
                        "real-imag-random")
    p.add_argument("--flatten_type", default="spatial",
                   choices=["spatial", "temporal"])
    p.add_argument("--train_mode", default="normal",
                   choices=["normal", "debug"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--n_epochs", type=int, default=None)
    p.add_argument("--log_dir", default="runs")
    p.add_argument("--data_root", default=None)
    p.add_argument("--use_mesh", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forwards in backward (activation "
                        "memory savings for 256^2 training)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision network compute (master "
                        "params/opt/EMA stay f32); ~1.3x train throughput "
                        "at 256^2 ngf128 on v5e")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N micro-batches "
                        "(optax.MultiSteps) — the memory-cheap route to "
                        "large effective batches (prefer this over --remat; "
                        "see docs/RESULTS_TRAIN_THROUGHPUT.md). EMA decays every "
                        "micro-step, so its effective per-update decay is "
                        "ema_rate**N")
    p.add_argument("--filter_th", type=float, default=None,
                   help="TV foreground threshold for 1D tube batches "
                        "(background tubes get zero loss weight); defaults "
                        "to config data.th when present (reference applies "
                        "filter_batch from config, pl_helpers.py:156 — a "
                        "no-op for non-1D batches)")
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VALUE")
    p.add_argument("--no_native_loader", action="store_true",
                   help="disable the C++ prefetch batcher train feed")
    p.add_argument("--if_centering", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="center inputs to [-1, 1] before collation "
                        "(the reference hardcodes this ON for score "
                        "training, train_ncsn.py:69)")
    p.add_argument("--notes", default=None,
                   help="free-form run description (written to desc.txt, "
                        "as the reference does, train_ncsn.py:91-93)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference CLI compatibility; "
                        "unused — the C++ prefetch batcher replaces "
                        "torch DataLoader workers")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from ._common import apply_overrides
    config = apply_overrides(load_config(args.ds_name, args.mode),
                             args.override)
    if args.filter_th is None:
        args.filter_th = config.data.get("th", None)
    batch_size = args.batch_size or config.training.batch_size
    n_epochs = args.n_epochs or config.training.n_epochs
    if args.train_mode == "debug":
        n_epochs, max_steps = 1, 2   # reference fast_dev_run=2
    else:
        # training.n_iters is the recipes' real stop criterion (the natural-
        # image YAMLs set n_epochs to an effectively-infinite 500000)
        max_steps = config.training.get("n_iters", None)

    kw = {"flatten_type": args.flatten_type}
    if args.data_root:
        kw["root_dir"] = args.data_root
    if "1D" not in args.ds_name and args.task_name != "Diffusion1D":
        kw.pop("flatten_type")
    if args.ds_name == "SanityCheck1D":
        # synthetic signals shaped to the model config
        kw = {"num_channels": config.data.channels,
              "num_features": config.data.image_size}
    train_ds = load_data(args.ds_name, "train", **kw)
    val_ds = load_data(args.ds_name, "val", **kw)
    train_data, val_data = train_ds.data, val_ds.data
    if args.task_name == "Diffusion3D":
        # (N, T, k^2) tubes -> (N, k, k, T, 1) volumes (the 2D+time net's
        # layout; reference reshapes at sample time, ncsn/models/ncsn3d.py:84)
        import numpy as _np
        win = int(_np.sqrt(train_data.shape[-1]))

        def to3d(d):
            N, T, KK = d.shape
            return d.transpose(0, 2, 1).reshape(N, win, win, T)[..., None]
        train_data, val_data = to3d(train_data), to3d(val_data)

    module, params = load_model(config, args.task_name)
    sigmas = get_sigmas(config)
    mesh = make_mesh() if args.use_mesh else None
    tx = get_optimizer(config)
    if args.grad_accum > 1:
        import optax
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accum)
    state = TrainState.create(params, tx,
                              ema_decay=config.model.get("ema_rate", 0.999))
    step = make_score_train_step(
        module, sigmas, data_mode=args.mode,
        anneal_power=config.training.anneal_power,
        mesh=mesh, filter_th=args.filter_th, remat=args.remat,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        if_centering=args.if_centering)
    eval_step = make_score_eval_step(module, sigmas, data_mode=args.mode,
                                     anneal_power=config.training.anneal_power,
                                     if_centering=args.if_centering)

    log_dir = os.path.join(args.log_dir,
                           f"{args.ds_name}_{args.task_name}_{args.mode}")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "desc.txt"), "w") as wf:
        # run metadata file, as the reference writes (train_ncsn.py:91-93)
        for k, v in sorted(vars(args).items()):
            wf.write(f"{k}: {v}\n")
    cfg = FitConfig(n_epochs=n_epochs, max_steps=max_steps,
                    log_dir=log_dir, seed=args.seed)
    state = fit(state, step,
                make_train_iterator(train_data, batch_size, seed=args.seed,
                                    prefer_native=not args.no_native_loader),
                cfg, eval_step=eval_step,
                val_iter_fn=batch_iterator(val_data, batch_size,
                                           shuffle=False, seed=0))
    print(f"done: {int(state.step)} steps; checkpoints under "
          f"{os.path.join(log_dir, 'ckpts')}")
    return state


if __name__ == "__main__":
    main()
