"""Unconditional ALD prior sampling (2D / 1D / 3D score nets).

Reference: scripts/unconditioned_sampling.py — reload_model ->
ALDUnconditionalSampler. The chain batch shards over the device mesh.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from ._common import apply_overrides, add_common_args, save_artifacts, reload_model
from ..config import load_config
from ..models.registry import make_score_fn
from ..parallel import make_mesh, shard_batch
from ..samplers import ALDConfig, ald_unconditional_sampler
from ..samplers.sigmas import get_sigmas


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="MNIST")
    p.add_argument("--task_name", default="Diffusion",
                   choices=["Diffusion", "Diffusion1D", "Diffusion3D"])
    p.add_argument("--mode", default="real-valued")
    p.add_argument("--step_lr", type=float, default=None)
    p.add_argument("--n_steps_each", type=int, default=None)
    p.add_argument("--use_mesh", action="store_true")
    args = p.parse_args(argv)

    config = load_config(args.ds_name, args.mode)
    config = apply_overrides(config, args.override)
    module, params = reload_model(config, args.task_name, args.ckpt_dir)
    sigmas = get_sigmas(config)
    score_fn = make_score_fn(module, params, sigmas)

    if args.task_name == "Diffusion1D":
        shape = (args.num_samples, config.data.image_size,
                 config.data.channels)
    else:
        s = config.data.image_size
        shape = (args.num_samples, s, s, config.data.channels)

    cfg = ALDConfig(
        n_steps_each=args.n_steps_each or config.sampling.n_steps_each,
        step_lr=args.step_lr or config.sampling.step_lr,
        denoise=config.sampling.get("denoise", True))
    key = jax.random.PRNGKey(args.seed)

    sampler = jax.jit(lambda p, x0, k: ald_unconditional_sampler(
        make_score_fn(module, p, sigmas), sigmas, shape, k, cfg, x_init=x0))
    key, k_init = jax.random.split(key)
    x_init = jax.random.uniform(k_init, shape)
    if args.use_mesh:
        # chains are independent batch rows: shard them over the mesh
        mesh = make_mesh()
        x_init = shard_batch(x_init, mesh)
    samples = jax.device_get(sampler(params, x_init, key))
    run_dir = save_artifacts(args.save_dir, vars(args), samples=samples)
    print(f"saved {samples.shape} samples -> {run_dir}")
    return samples


if __name__ == "__main__":
    main()
