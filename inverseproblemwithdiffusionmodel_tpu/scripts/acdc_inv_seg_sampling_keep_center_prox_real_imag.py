"""Headline single-coil ACDC reconstruction: ALD + segmentation guidance +
proximal data consistency on the Re/Im split.

Reference: scripts/acdc_inv_seg_sampling_keep_center_prox_real_imag.py —
RandomUndersamplingFourier + get_proximal + ALDInvSegProximalRealImag with
synthetic phase (add_phase) and the `recons` sigma ladder.
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
    p.add_argument("--ds_name", default="ACDC")
    p.add_argument("--R", type=int, default=8)
    p.add_argument("--center_lines_frac", type=float, default=1 / 16)
    p.add_argument("--lamda", type=float, default=1.0, help="seg guidance weight")
    p.add_argument("--lr_scaled", type=float, default=5.0,
                   help="proximal step scale")
    p.add_argument("--proximal", "--proximal_type", default="L2Penalty",
                   choices=["L2Penalty", "Constrained", "SingleCoil"])
    p.add_argument("--seg_start_time", type=float, default=1.0,
                   help="guidance ramp start (1.0 disables guidance)")
    p.add_argument("--seg_step_type", default="linear",
                   help="guidance ramp curve (reference name)")
    p.add_argument("--seg_ckpt_dir", default=None)
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
    kw = {"image_size": s}
    if args.data_root:
        kw["root_dir"] = args.data_root
    ds = load_data(args.ds_name, "test", **kw)
    img = jnp.asarray(ds.data[args.sample_idx:args.sample_idx + 1])
    seg_label = jnp.asarray(ds.labels[args.sample_idx:args.sample_idx + 1])

    key = jax.random.PRNGKey(args.seed)
    key, k_phase, k_run = jax.random.split(key, 3)
    x_true = add_phase(img, k_phase)                       # complex (1,H,W,1)

    lin_tfm = RandomUndersamplingFourier.create(
        args.R, args.center_lines_frac, (s, s, 1), seed=args.seed,
        num_frames=1)
    measurement = lin_tfm(x_true)
    zf = lin_tfm.conj_op(measurement)

    module, params = reload_model(config, "Diffusion", args.ckpt_dir)
    sigmas = get_sigmas(config, "recons")

    use_seg = args.seg_start_time < 1.0
    seg_module, seg_params, seg_label_b = None, 0, None
    if use_seg:
        seg_module, seg_params = reload_model(config, "Seg", args.seg_ckpt_dir)
        seg_label_b = repeat_measurement(seg_label, args.num_samples)

    cfg = ALDConfig(
                    n_steps_each=args.num_steps_each or config.sampling.n_steps_each,
                    step_lr=args.step_lr or config.sampling.step_lr)
    check_ladder_stability(sigmas, cfg.n_steps_each, cfg.step_lr)
    y_b = repeat_measurement(measurement, args.num_samples)
    proximal = get_proximal(args.proximal)(lin_tfm=lin_tfm)

    # params AND the seg-label batch enter through the jit boundary
    # (closed-over pytrees/arrays would be inlined as HLO constants —
    # slow lowering, remote-compile aborts, and unshardable labels;
    # cf. acdc_SENSE_real_img.py)
    @jax.jit
    def recon_fn(p, sp, y, seg_lbl, k):
        sfn = make_score_fn(module, p, sigmas)
        gfn = (lambda x: seg_module.apply({"params": sp}, x)) if use_seg else None
        return ald_inverse_seg_proximal_real_imag(
            sfn, sigmas, y, lin_tfm, proximal, k, cfg,
            lr_scaled=args.lr_scaled, seg_fn=gfn, seg_label=seg_lbl,
            seg_lamda=args.lamda, seg_start_time=args.seg_start_time,
            seg_step_type=args.seg_step_type)

    recons = jax.device_get(
        recon_fn(params, seg_params, y_b, seg_label_b, k_run))

    mean_mag = np.abs(recons).mean(axis=0)
    truth_mag = np.abs(np.asarray(x_true[0]))
    m_nrmse = float(nrmse(jnp.asarray(mean_mag), jnp.asarray(truth_mag)))
    m_ssim = float(ssim(jnp.asarray(mean_mag[..., 0]),
                        jnp.asarray(truth_mag[..., 0])))
    print(f"NRMSE {m_nrmse:.4f}  SSIM {m_ssim:.4f}  "
          f"(ZF NRMSE {float(nrmse(jnp.abs(zf)[0], jnp.asarray(truth_mag))):.4f})")

    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recons, seg_label=seg_label)
    print(f"artifacts -> {run_dir}")
    return recons


if __name__ == "__main__":
    main()
