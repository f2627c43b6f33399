"""2D+time cine MAP reconstruction (factorized spatial + temporal priors).

Reference: scripts/cine_SENSE_real_img_2d_time_MAP.py — MAPOptimizer2DTime
(:160-169).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ._common import apply_overrides, add_common_args, save_artifacts, reload_model
from ..config import load_config
from ..data import load_cine, transforms as dT
from ..models.registry import make_score_fn, make_tube_score_fn_3d
from ..operators import make_sense
from ..samplers import MAPConfig, map_optimizer_2d_time
from ..samplers.sigmas import get_sigmas
from ..utils.misc import add_phase
from ..utils.metrics import nrmse, ssim


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="CINE127")
    p.add_argument("--ds_name_T", default="CINE127_1D")
    p.add_argument("--task_name_T", "--temporal_type", default="Diffusion1D")
    p.add_argument("--mode_T", default="diffusion1d",
                   choices=["tv", "diffusion1d", "none"])
    p.add_argument("--R", type=int, default=8, choices=[8, 16, 20])
    p.add_argument("--num_sens", type=int, default=4)
    p.add_argument("--center_lines_frac", type=float,
                   default=1 / 16)
    p.add_argument("--sens_type", default="exp", choices=["exp"],
                   help="synthetic coil-map family (reference default exp)")
    p.add_argument("--prior_weight", type=float, default=1.0)
    p.add_argument("--spatial_step_weight", type=float, default=1.0)
    p.add_argument("--temporal_step_weight", type=float, default=1.0)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--num_frames", type=int, default=24)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--n_iters", "--num_iters", "--max_iter",
                   type=int, default=None,
                   help="Adam iterations (reference names: "
                        "--num_iters/--max_iter)")
    p.add_argument("--beta1", type=float, default=None)
    p.add_argument("--beta2", type=float, default=None)
    p.add_argument("--if_random_shift", action="store_true")
    p.add_argument("--num_plot_times", type=int, default=6,
                   help="frames in the saved temporal strip "
                        "(reference name)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--ckpt_dir_T", default=None)
    p.add_argument("--override_T", action="append", default=[],
                   metavar="KEY=VALUE")
    p.add_argument("--sample_idx", "--ds_idx", type=int, default=0,
                   help="test-set slice index (reference name: --ds_idx)")
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)

    config_S = apply_overrides(load_config(args.ds_name, "real-imag"), args.override)
    config_T = apply_overrides(load_config(args.ds_name_T, "real-imag"), args.override_T or [])
    s = args.image_size or (128 if "127" in args.ds_name else 64)
    T = args.num_frames

    kw = {"root_dir": args.data_root} if args.data_root else {}
    vols = load_cine(mode="test", flatten=False, **kw).data
    vol = dT.resize(vols[args.sample_idx], (s, s))
    if vol.shape[0] != T:
        vol = dT.resize(vol.transpose(1, 0, 2), (T, s)).transpose(1, 0, 2)
    vol = jnp.asarray(vol)[..., None]

    key = jax.random.PRNGKey(args.seed)
    key, k_phase = jax.random.split(key)
    x_true = add_phase(vol, k_phase, init_shape=(5, 5, 5), mode="2D+time")

    lin_tfm = make_sense(args.sens_type, args.num_sens, args.R,
                         args.center_lines_frac,
                         (s, s, 1), seed=args.seed, num_frames=T)
    measurement = lin_tfm(x_true)
    zf = lin_tfm.conj_op(measurement)
    # chain ensemble (reference repeats the measurement, :117); per-frame
    # masks are tiled to the B*T chain-by-frame axis
    from ..parallel import repeat_measurement
    B = args.num_samples
    measurement_b = repeat_measurement(measurement, B, batch_axis=1)
    lin_tfm_b = lin_tfm if B == 1 else lin_tfm.replace(
        base=lin_tfm.base.replace(
            mask=jnp.tile(lin_tfm.base.mask, (B, 1, 1, 1))))

    module_S, params_S = reload_model(config_S, "Diffusion", args.ckpt_dir)
    sigmas_S = get_sigmas(config_S, "recons")
    sigmas_T = get_sigmas(config_T, "recons")
    use_T = args.mode_T == "diffusion1d"
    module_T, params_T = (None, 0)
    if use_T:
        module_T, params_T = reload_model(config_T, args.task_name_T,
                                          args.ckpt_dir_T)

    # cine configs carry no MAP section (reference cine127.yml has none
    # either); fall back to MAPConfig defaults
    map_cfg = config_S.get("MAP")
    cfg = MAPConfig(
        n_iters=args.n_iters or (map_cfg.n_iters if map_cfg else 200),
        lr=args.lr or (map_cfg.lr if map_cfg else 1e-3),
        b1=args.beta1 if args.beta1 is not None else 0.5,
        b2=args.beta2 if args.beta2 is not None else 0.5)
    t0 = time.time()
    recon = jax.jit(
        lambda pS, pT, y: map_optimizer_2d_time(
            make_score_fn(module_S, pS, sigmas_S),
            (make_tube_score_fn_3d(module_T, pT, sigmas_T, args.win_size)
             if use_T and args.task_name_T == "Diffusion3D"
             else make_score_fn(module_T, pT, sigmas_T) if use_T else None),
            y, lin_tfm_b, cfg,
            prior_weight=args.prior_weight,
            spatial_step_weight=args.spatial_step_weight,
            temporal_step_weight=args.temporal_step_weight,
            mode_T=args.mode_T,
            if_random_shift=args.if_random_shift,
            win_size=args.win_size, num_frames=T))(
        params_S, params_T, measurement_b)
    # sync via a device->host scalar fetch (block_until_ready is not a
    # trustworthy sync on remote-dispatch backends — see CLAUDE.md)
    _ = float(jnp.abs(recon).sum())
    print(f"MAP 2D+time wall-clock: {time.time() - t0:.2f}s")

    # ensemble mean of magnitudes (B=1 reduces to one chain)
    mag = np.abs(np.asarray(recon)).mean(axis=0)
    truth = np.abs(np.asarray(x_true))
    ssims = [float(ssim(jnp.asarray(mag[t, ..., 0]),
                        jnp.asarray(truth[t, ..., 0]))) for t in range(T)]
    print(f"R={args.R} mode_T={args.mode_T}: "
          f"NRMSE {float(nrmse(jnp.asarray(mag), jnp.asarray(truth))):.4f} "
          f"SSIM {np.mean(ssims):.4f}")

    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recon)
    from ..utils.visualizations import grid_of_temporal_samples
    grid_of_temporal_samples(mag, num_frames=min(args.num_plot_times, T),
                             save_path=f"{run_dir}/temporal_grid.png")
    print(f"artifacts -> {run_dir}")
    return recon


if __name__ == "__main__":
    main()
