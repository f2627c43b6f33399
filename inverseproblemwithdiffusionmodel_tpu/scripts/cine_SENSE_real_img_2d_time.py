"""Headline 2D+time cine reconstruction: factorized spatial 2-D score +
temporal 1-D score (or TV) + per-frame SENSE data consistency.

Reference: scripts/cine_SENSE_real_img_2d_time.py — ALD2DTime with two
configs/sigma ladders (:63-87), per-frame masks, wall-clock timing printed
(:163-182).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ._common import apply_overrides, add_common_args, save_artifacts, reload_model
from ..config import load_config
from ..data import load_cine
from ..models.registry import make_score_fn, make_tube_score_fn_3d
from ..operators import make_sense, L2Penalty
from ..samplers import ALDConfig, ald_2d_time, check_ladder_stability
from ..samplers.sigmas import get_sigmas
from ..utils.misc import add_phase
from ..utils.metrics import nrmse, ssim


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="CINE127")
    p.add_argument("--ds_name_T", default="CINE127_1D")
    p.add_argument("--task_name_T", "--temporal_type", default="Diffusion1D",
                   choices=["Diffusion1D", "Diffusion3D"])
    p.add_argument("--mode_T", default="diffusion1d",
                   choices=["tv", "diffusion1d", "none", "diffusion1d-only",
                            "tv-only"])
    p.add_argument("--R", type=int, default=8, choices=[8, 16, 20])
    p.add_argument("--num_sens", type=int, default=4)
    p.add_argument("--center_lines_frac", type=float,
                   default=1 / 16)
    p.add_argument("--sens_type", default="exp", choices=["exp"],
                   help="synthetic coil-map family (reference default exp)")
    p.add_argument("--lamda_T", type=float, default=1.0)
    p.add_argument("--lr_scaled", type=float, default=5.0)
    p.add_argument("--proximal_type", default="L2Penalty",
                   choices=["L2Penalty", "Constrained"],
                   help="data-consistency step (SingleCoil's "
                        "closed form needs a single-coil "
                        "masked-Fourier operator)")
    p.add_argument("--if_random_shift", action="store_true")
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--num_frames", type=int, default=24)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--ckpt_dir_T", default=None)
    p.add_argument("--override_T", action="append", default=[],
                   metavar="KEY=VALUE")
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

    config_S = apply_overrides(load_config(args.ds_name, "real-imag"), args.override)
    config_T = apply_overrides(load_config(args.ds_name_T, "real-imag"), args.override_T or [])
    s = args.image_size or (128 if "127" in args.ds_name else 64)
    T = args.num_frames

    kw = {"root_dir": args.data_root} if args.data_root else {}
    vols = load_cine(mode="test", flatten=False, **kw).data  # (N, T0, H, W)
    vol = vols[args.sample_idx]
    # resize to (T, s, s)
    from ..data import transforms as dT
    vol = dT.resize(vol, (s, s))               # (T0, s, s) via channel trick
    if vol.shape[0] != T:
        vol = dT.resize(vol.transpose(1, 0, 2), (T, s)).transpose(1, 0, 2)
    vol = jnp.asarray(vol)[..., None]          # (T, s, s, 1)

    key = jax.random.PRNGKey(args.seed)
    key, k_phase, k_run = jax.random.split(key, 3)
    x_true = add_phase(vol, k_phase, init_shape=(5, 5, 5), mode="2D+time")

    lin_tfm = make_sense(args.sens_type, args.num_sens, args.R,
                         args.center_lines_frac,
                         (s, s, 1), seed=args.seed, num_frames=T)
    measurement = lin_tfm(x_true)              # (S, T, s, s, 1)
    zf = lin_tfm.conj_op(measurement)
    # ensemble chains: B-major repeat of the T-frame block -> (S, B*T, ...)
    # (reference: cine_SENSE_real_img_2d_time.py:121 measurement.repeat).
    # The per-frame mask must be tiled to the same B*T chain-by-frame axis
    # or the proximal's forward op cannot broadcast against the batch.
    from ..parallel import repeat_measurement
    B = args.num_samples
    measurement_b = repeat_measurement(measurement, B, batch_axis=1)
    lin_tfm_b = lin_tfm if B == 1 else lin_tfm.replace(
        base=lin_tfm.base.replace(
            mask=jnp.tile(lin_tfm.base.mask, (B, 1, 1, 1))))

    module_S, params_S = reload_model(config_S, "Diffusion", args.ckpt_dir)
    sigmas_S = get_sigmas(config_S, "recons")

    use_T = "diffusion1d" in args.mode_T
    sigmas_T = get_sigmas(config_T, "recons")
    module_T, params_T = (None, 0)
    if use_T:
        module_T, params_T = reload_model(config_T, args.task_name_T,
                                          args.ckpt_dir_T)

    cfg = ALDConfig(
                    n_steps_each=args.num_steps_each or config_S.sampling.n_steps_each,
                    step_lr=args.step_lr or config_S.sampling.step_lr)
    check_ladder_stability(sigmas_S, cfg.n_steps_each, cfg.step_lr)
    from ..operators import get_proximal
    proximal = get_proximal(args.proximal_type)(lin_tfm=lin_tfm_b)

    # params as jit args (closed-over pytrees would be inlined as constants)
    @jax.jit
    def recon_fn(pS, pT, y, k):
        sS = make_score_fn(module_S, pS, sigmas_S)
        if not use_T:
            sT = None
        elif args.task_name_T == "Diffusion3D":
            sT = make_tube_score_fn_3d(module_T, pT, sigmas_T, args.win_size)
        else:
            sT = make_score_fn(module_T, pT, sigmas_T)
        return ald_2d_time(
            sS, sT, sigmas_S, sigmas_T, y, lin_tfm_b, proximal, k,
            cfg, lr_scaled=args.lr_scaled, mode_T=args.mode_T,
            lamda_T=args.lamda_T, if_random_shift=args.if_random_shift,
            win_size=args.win_size, num_frames=T)

    t0 = time.time()
    recons = recon_fn(params_S, params_T, measurement_b, k_run)
    # sync via a device->host scalar fetch (block_until_ready is not a
    # trustworthy sync on remote-dispatch backends — see CLAUDE.md); the
    # wall time INCLUDES the one-off XLA compile, so this is an end-to-end
    # figure, not the steady-state rate (bench.py measures that)
    _ = float(jnp.abs(recons).sum())
    wall = time.time() - t0
    print(f"2D+time recon wall-clock (incl. compile): {wall:.2f}s "
          f"({sigmas_S.shape[0] * cfg.n_steps_each / wall:.2f} ALD "
          f"steps/s end-to-end; steady-state throughput: bench.py)")

    # ensemble mean of magnitudes (the reference's "mean of N
    # reconstructions"); B=1 reduces to the single chain
    mag = np.abs(np.asarray(recons)).mean(axis=0)   # (T, s, s, 1)
    truth = np.abs(np.asarray(x_true))
    m_nrmse = float(nrmse(jnp.asarray(mag), jnp.asarray(truth)))
    ssims = [float(ssim(jnp.asarray(mag[t, ..., 0]),
                        jnp.asarray(truth[t, ..., 0]))) for t in range(T)]
    print(f"R={args.R} mode_T={args.mode_T}: NRMSE {m_nrmse:.4f} "
          f"SSIM {np.mean(ssims):.4f}")

    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recons)
    print(f"artifacts -> {run_dir}")
    return recons


if __name__ == "__main__":
    main()
