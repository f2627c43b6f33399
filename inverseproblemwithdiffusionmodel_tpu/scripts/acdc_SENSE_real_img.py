"""Multi-coil SENSE ACDC reconstruction (R up to 40, 4 coils) with ALD +
optional seg guidance + proximal data consistency.

Reference: scripts/acdc_SENSE_real_img.py — SENSE operator with synthetic
exp coil maps + ALDInvSegProximalRealImag; ensembles as batch rows
(:104 `torch.cat([measurement] * num_samples)`).
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
from ..operators import make_sense, L2Penalty
from ..parallel import repeat_measurement, ensemble_mean_std
from ..samplers import (ALDConfig, ald_inverse_seg_proximal_real_imag,
                        check_ladder_stability)
from ..samplers.sigmas import get_sigmas
from ..utils.misc import add_phase
from ..utils.metrics import nrmse, ssim


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="ACDC")
    p.add_argument("--R", type=int, default=8, choices=[8, 16, 20])
    p.add_argument("--num_sens", type=int, default=4)
    p.add_argument("--sens_type", default="exp", choices=["exp"],
                   help="synthetic coil-map family (reference default exp)")
    p.add_argument("--center_lines_frac", type=float, default=1 / 16)
    p.add_argument("--lamda", type=float, default=1.0)
    p.add_argument("--lr_scaled", type=float, default=5.0)
    p.add_argument("--proximal_type", default="L2Penalty",
                   choices=["L2Penalty", "Constrained"],
                   help="data-consistency step (SingleCoil's "
                        "closed form needs a single-coil "
                        "masked-Fourier operator)")
    p.add_argument("--seg_start_time", type=float, default=1.0)
    p.add_argument("--seg_step_type", default="linear",
                   help="guidance ramp curve (reference name)")
    p.add_argument("--seg_mode", default="full", choices=["full", "FG"],
                   help="apply the seg gradient everywhere or only on "
                        "foreground pixels (reference name)")
    p.add_argument("--seg_fraction", type=float, default=1.0,
                   help="fraction of foreground seg pixels kept for "
                        "guidance (reference: undersample_seg_mask, "
                        "acdc_SENSE_real_img.py:92)")
    p.add_argument("--seg_ckpt_dir", default=None)
    p.add_argument("--use_mesh", action="store_true",
                   help="shard the ensemble chains over all local devices")
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
    x_true = add_phase(img, k_phase)

    lin_tfm = make_sense(args.sens_type, args.num_sens, args.R,
                         args.center_lines_frac, (s, s, 1), seed=args.seed,
                         num_frames=1)
    measurement = lin_tfm(x_true)                  # (S, 1, H, W, 1)
    zf = lin_tfm.conj_op(measurement)

    module, params = reload_model(config, "Diffusion", args.ckpt_dir)
    sigmas = get_sigmas(config, "recons")

    use_seg = args.seg_start_time < 1.0
    seg_module, seg_params, seg_label_b = None, 0, None
    if use_seg:
        seg_module, seg_params = reload_model(config, "Seg", args.seg_ckpt_dir)
        if args.seg_fraction < 1.0:
            from ..utils.misc import undersample_seg_mask
            key, k_frac = jax.random.split(key)
            seg_label = undersample_seg_mask(seg_label, args.seg_fraction,
                                             k_frac)
        seg_label_b = repeat_measurement(seg_label, args.num_samples)

    cfg = ALDConfig(
                    n_steps_each=args.num_steps_each or config.sampling.n_steps_each,
                    step_lr=args.step_lr or config.sampling.step_lr)
    check_ladder_stability(sigmas, cfg.n_steps_each, cfg.step_lr)
    y_b = repeat_measurement(measurement, args.num_samples, batch_axis=1)
    if args.use_mesh:
        # chains are independent: shard the chain axis over the mesh (padded
        # to the device count); XLA runs each shard's chains on its device
        from ..parallel import make_mesh, shard_chain_axis
        mesh = make_mesh()
        y_b, _ = shard_chain_axis(y_b, mesh, axis=1)
        if seg_label_b is not None:
            seg_label_b = repeat_measurement(seg_label, y_b.shape[1])
            seg_label_b, _ = shard_chain_axis(seg_label_b, mesh, axis=0)
    from ..operators import get_proximal
    proximal = get_proximal(args.proximal_type)(lin_tfm=lin_tfm)

    @jax.jit
    def recon_fn(p, sp, y, slb, k):
        # params AND the seg label batch are jit arguments — closed-over
        # arrays become HLO constants (slow lowering, oversized programs on
        # remote-compile backends) and lose their shardings
        sfn = make_score_fn(module, p, sigmas)
        gfn = (lambda x: seg_module.apply({"params": sp}, x)) if use_seg else None
        return ald_inverse_seg_proximal_real_imag(
            sfn, sigmas, y, lin_tfm, proximal, k, cfg,
            lr_scaled=args.lr_scaled, seg_fn=gfn, seg_label=slb,
            seg_lamda=args.lamda, seg_start_time=args.seg_start_time,
            seg_step_type=args.seg_step_type, seg_mode=args.seg_mode)

    recons = jax.device_get(
        recon_fn(params, seg_params, y_b, seg_label_b, k_run))
    recons = recons[:args.num_samples]  # drop mesh-padding chains

    mean_mag, std_mag = ensemble_mean_std(jnp.asarray(recons))
    truth_mag = np.abs(np.asarray(x_true[0]))
    m_nrmse = float(nrmse(mean_mag, jnp.asarray(truth_mag)))
    m_ssim = float(ssim(mean_mag[..., 0], jnp.asarray(truth_mag[..., 0])))
    print(f"R={args.R} {args.num_sens}-coil: NRMSE {m_nrmse:.4f} "
          f"SSIM {m_ssim:.4f}")

    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recons,
                             ensemble_mean=mean_mag, ensemble_std=std_mag)
    print(f"artifacts -> {run_dir}")
    return recons


if __name__ == "__main__":
    main()
