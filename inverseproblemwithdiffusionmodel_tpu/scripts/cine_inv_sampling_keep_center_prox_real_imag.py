"""CINE single-frame 2-D reconstruction, keep-center mask + proximal Re/Im.

Reference: scripts/cine_inv_sampling_keep_center_prox_real_imag.py — same
pattern as the ACDC keep-center script on CINE127 frames.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ._common import apply_overrides, add_common_args, save_artifacts, reload_model
from ..config import load_config
from ..data import load_data
from ..models.registry import make_score_fn
from ..operators import RandomUndersamplingFourier, get_proximal
from ..parallel import repeat_measurement
from ..samplers import (ALDConfig, ald_inverse_seg_proximal_real_imag,
                        check_ladder_stability)
from ..samplers.sigmas import get_sigmas
from ..utils.misc import add_phase
from ..utils.metrics import nrmse, ssim


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="CINE127")
    p.add_argument("--R", type=int, default=8, choices=[8, 16, 20])
    p.add_argument("--center_lines_frac", type=float, default=1 / 16)
    p.add_argument("--lr_scaled", type=float, default=5.0)
    p.add_argument("--lamda", type=float, default=0.1,
                   help="guidance weight (reference surface; "
                        "inert — the reference passes label=None here too)")
    p.add_argument("--seg_start_time", type=float, default=0.0)
    p.add_argument("--seg_step_type", default="linear")
    p.add_argument("--proximal", "--proximal_type", default="L2Penalty",
                   choices=["L2Penalty", "Constrained", "SingleCoil"])
    p.add_argument("--sample_idx", "--ds_idx", type=int, default=0,
                   help="test-set slice index (reference name: --ds_idx)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--step_lr", type=float, default=None,
                   help="Langevin step size (defaults to the config's "
                        "sampling.step_lr)")
    p.add_argument("--num_steps_each", type=int, default=None,
                   help="inner steps per noise level (defaults to the "
                        "config's sampling.n_steps_each)")
    args = p.parse_args(argv)

    config = load_config(args.ds_name, "real-imag")
    config = apply_overrides(config, args.override)
    s = config.data.image_size
    kw = {"root_dir": args.data_root} if args.data_root else {}
    ds = load_data(args.ds_name, "test", resize_shape=s, **kw)
    img = jnp.asarray(ds.data[args.sample_idx:args.sample_idx + 1])

    key = jax.random.PRNGKey(args.seed)
    key, k_phase, k_run = jax.random.split(key, 3)
    x_true = add_phase(img, k_phase)

    lin_tfm = RandomUndersamplingFourier.create(
        args.R, args.center_lines_frac, (s, s, 1), seed=args.seed,
        num_frames=1)
    measurement = lin_tfm(x_true)
    zf = lin_tfm.conj_op(measurement)

    module, params = reload_model(config, "Diffusion", args.ckpt_dir)
    sigmas = get_sigmas(config, "recons")

    cfg = ALDConfig(
                    n_steps_each=args.num_steps_each or config.sampling.n_steps_each,
                    step_lr=args.step_lr or config.sampling.step_lr)
    check_ladder_stability(sigmas, cfg.n_steps_each, cfg.step_lr)
    y_b = repeat_measurement(measurement, args.num_samples)
    proximal = get_proximal(args.proximal)(lin_tfm=lin_tfm)

    recons = jax.device_get(jax.jit(lambda p, y, k:
        ald_inverse_seg_proximal_real_imag(
            make_score_fn(module, p, sigmas), sigmas, y, lin_tfm, proximal,
            k, cfg, lr_scaled=args.lr_scaled))(params, y_b, k_run))

    mean_mag = np.abs(recons).mean(axis=0)
    truth = np.abs(np.asarray(x_true[0]))
    print(f"R={args.R}: NRMSE "
          f"{float(nrmse(jnp.asarray(mean_mag), jnp.asarray(truth))):.4f} "
          f"SSIM {float(ssim(jnp.asarray(mean_mag[..., 0]), jnp.asarray(truth[..., 0]))):.4f}")

    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recons)
    print(f"artifacts -> {run_dir}")
    return recons


if __name__ == "__main__":
    main()
