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
from ..parallel import make_mesh, shard_chain_axis
from ..samplers import (ALDConfig, ald_unconditional_sampler,
                        check_ladder_stability)
from ..samplers.sigmas import get_sigmas


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="MNIST")
    p.add_argument("--task_name", default="Diffusion",
                   choices=["Diffusion", "Diffusion1D", "Diffusion3D"])
    p.add_argument("--mode", default="real-valued")
    p.add_argument("--step_lr", type=float, default=None)
    p.add_argument("--n_steps_each", "--num_steps_each",
                   type=int, default=None)
    p.add_argument("--if_save_fig", action="store_true",
                   help="save 1-D signal figures "
                        "(reference: for 1D only)")
    p.add_argument("--if_save_as_gif", action="store_true",
                   help="save temporal samples as GIFs "
                        "(reference: for 1D only)")
    p.add_argument("--use_mesh", action="store_true")
    args = p.parse_args(argv)

    config = load_config(args.ds_name, args.mode)
    config = apply_overrides(config, args.override)
    module, params = reload_model(config, args.task_name, args.ckpt_dir)
    sigmas = get_sigmas(config)

    if args.task_name == "Diffusion1D":
        shape = (args.num_samples, config.data.image_size,
                 config.data.channels)
    elif args.task_name == "Diffusion3D":
        # 3-D nets sample (win, win, T, C3) volumes; channels = win^2 tubes
        # (registry._example_input, reference: ncsn/models/ncsn3d.py:84)
        win = int(np.sqrt(config.data.channels))
        shape = (args.num_samples, win, win, config.data.image_size,
                 config.data.get("channels_3d", 1))
    else:
        s = config.data.image_size
        shape = (args.num_samples, s, s, config.data.channels)

    cfg = ALDConfig(
        n_steps_each=args.n_steps_each or config.sampling.n_steps_each,
        step_lr=args.step_lr or config.sampling.step_lr,
        denoise=config.sampling.get("denoise", True))
    check_ladder_stability(sigmas, cfg.n_steps_each, cfg.step_lr)
    key = jax.random.PRNGKey(args.seed)

    sampler = jax.jit(lambda p, x0, k: ald_unconditional_sampler(
        make_score_fn(module, p, sigmas), sigmas, x0.shape, k, cfg,
        x_init=x0))
    key, k_init = jax.random.split(key)
    x_init = jax.random.uniform(k_init, shape)
    if args.use_mesh:
        # chains are independent batch rows: shard them over the mesh,
        # padded to the device count (padding rows dropped below)
        mesh = make_mesh()
        x_init, _ = shard_chain_axis(x_init, mesh)
    samples = jax.device_get(sampler(params, x_init, key))
    samples = samples[:args.num_samples]
    run_dir = save_artifacts(args.save_dir, vars(args), samples=samples)
    if args.if_save_fig and samples.ndim == 3:      # (B, T, C) 1-D signals
        from ..utils.visualizations import vis_signals
        vis_signals(*[samples[i] for i in range(min(4, len(samples)))],
                    save_path=f"{run_dir}/signals.png")
    if args.if_save_as_gif:
        import numpy as _np
        from ..utils.visualizations import save_vol_as_gif
        vol = None
        if samples.ndim == 5:      # (B, win, win, T, C) 3-D net volumes
            vol = _np.moveaxis(samples[0][..., 0], -1, 0)     # (T, H, W)
        elif samples.ndim == 3:    # (B, T, k^2) pixel tubes (1-D nets)
            k = int(_np.sqrt(samples.shape[-1]))
            if k * k == samples.shape[-1]:
                vol = samples[0].reshape(-1, k, k)            # (T, k, k)
        if vol is not None:
            save_vol_as_gif(_np.asarray(vol), f"{run_dir}/sample0.gif")
        else:
            print("--if_save_as_gif: only 1-D tube or 3-D volume samples "
                  "have a temporal axis to animate; skipped")
    print(f"saved {samples.shape} samples -> {run_dir}")
    return samples


if __name__ == "__main__":
    main()
