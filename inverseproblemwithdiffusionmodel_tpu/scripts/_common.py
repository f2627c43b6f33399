"""Shared CLI machinery: artifact layout, model reload, measurement
simulation.

Reference conventions (SURVEY.md §2.6): every script saves original /
measurement / ZF / reconstructions tensors plus an args dump into a
timestamped directory and logs to stdout. Here artifacts are .npy + a JSON
args dump (portable, no pickle), and model reload goes through orbax
checkpoints instead of hard-coded timestamp registries
(reference: helpers/load_model.py:42-122).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..models.registry import load_model
from ..training import Checkpointer
from ..utils.misc import get_timestamp


def save_artifacts(save_dir: str, args: Optional[Dict[str, Any]] = None,
                   **arrays: Any) -> str:
    """Save arrays as .npy + args.json; returns the run directory."""
    run_dir = os.path.join(save_dir, get_timestamp())
    os.makedirs(run_dir, exist_ok=True)
    for name, arr in arrays.items():
        if arr is not None:
            np.save(os.path.join(run_dir, f"{name}.npy"),
                    np.asarray(jax.device_get(arr)))
    if args is not None:
        payload = {k: (v if isinstance(v, (int, float, str, bool,
                                           list, type(None))) else str(v))
                   for k, v in args.items()}
        # record which datasets this process loaded and whether each came
        # from real files or the synthetic stand-in, so every metrics.txt
        # downstream is interpretable (synthetic-fallback runs are labeled)
        from ..data.datasets import data_provenance
        prov = data_provenance()
        if prov:
            payload["data_provenance"] = prov
        with open(os.path.join(run_dir, "args.json"), "w") as f:
            json.dump(payload, f, indent=2, default=str)
    return run_dir


def reload_model(config: Config, task_name: str,
                 ckpt_dir: Optional[str] = None,
                 use_ema: bool = True) -> Tuple[Any, Any]:
    """Construct a model and load EMA params from an orbax checkpoint dir
    (reference: helpers/load_model.py:146-186 loads the EMA weights). Falls
    back to fresh init with a loud warning when no checkpoint exists, so
    pipelines stay runnable end-to-end."""
    module, params = load_model(config, task_name)
    if ckpt_dir and os.path.isdir(ckpt_dir):
        # structure-agnostic params-only restore: works for checkpoints
        # written with EMA off (clf/seg trainers) or with a wrapped
        # optimizer (--grad_accum MultiSteps), unlike a full-TrainState
        # template restore
        ckpt = Checkpointer(ckpt_dir, track_best=False)
        loaded, step = ckpt.restore_params(use_ema=use_ema)
        ckpt.close()
        params = jax.tree_util.tree_map(jnp.asarray, loaded)
        print(f"[reload_model] {task_name}: restored step "
              f"{step} from {ckpt_dir}")
    else:
        print(f"[reload_model] WARNING: no checkpoint for {task_name} "
              f"(ckpt_dir={ckpt_dir!r}); using FRESH random weights")
    return module, params


def add_common_args(parser, num_samples: bool = True, ckpt: bool = True):
    """Shared CLI flags. Scripts that cannot honor a flag must not
    advertise it (a silently-ignored --num_samples misdocuments the run's
    args.json): deterministic single-chain optimizers pass
    num_samples=False; prior-free baselines (TV) pass ckpt=False."""
    parser.add_argument("--save_dir", default="outputs")
    if ckpt:
        parser.add_argument("--ckpt_dir", default=None,
                            help="orbax checkpoint dir of the trained "
                                 "score model")
    parser.add_argument("--seed", type=int, default=0)
    if num_samples:
        parser.add_argument("--num_samples", type=int, default=1,
                            help="ensemble chains (batch rows)")
    parser.add_argument("--override", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="dotted config override, e.g. model.ngf=16")
    return parser


def apply_overrides(config: Config, overrides) -> Config:
    """Apply repeated --override key=value flags (yaml-parsed values)."""
    import yaml
    if not overrides:
        return config
    updates = {}
    for item in overrides:
        key, _, value = item.partition("=")
        updates[key] = yaml.safe_load(value)
    return config.replace(**updates)
