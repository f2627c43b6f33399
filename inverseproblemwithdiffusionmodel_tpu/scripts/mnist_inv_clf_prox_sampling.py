"""Class-conditional MNIST inverse sampling with proximal data consistency.

Reference: scripts/mnist_inv_clf_prox_sampling.py — imports the deleted
`ALDInvClfProximal`; re-grown as samplers.ald_inverse_clf_proximal
(clf guidance + Re/Im proximal pattern of ALD_optimizers.py:161-327).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ._common import apply_overrides, add_common_args, save_artifacts, reload_model
from ..config import load_config
from ..data import load_data
from ..models.registry import make_score_fn
from ..operators import SkipLines, get_proximal
from ..parallel import repeat_measurement
from ..samplers import (ALDConfig, ald_inverse_clf_proximal,
                        check_ladder_stability)
from ..samplers.sigmas import get_sigmas


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="MNIST")
    p.add_argument("--cls", type=int, default=3)
    p.add_argument("--num_skip_lines", type=int, default=2,
                   help="keep-stride: keep every Nth image row "
                        "(reference default 2)")
    p.add_argument("--lr_scaled", type=float, default=5.0)
    p.add_argument("--clf_lamda", "--lamda", type=float, default=1.0,
                   help="classifier-guidance weight (reference name: --lamda)")
    p.add_argument("--clf_start_time", type=float, default=0.0,
                   help="guidance ramp start as a ladder fraction "
                        "(reference default 0)")
    p.add_argument("--clf_step_type", default="linear")
    # SingleCoil's closed form assumes a masked-Fourier operator; the
    # image-domain SkipLines measurement supports the CG and projection forms
    p.add_argument("--proximal", "--proximal_type", default="L2Penalty",
                   choices=["L2Penalty", "Constrained"])
    p.add_argument("--clf_ckpt_dir", default=None)
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
    kw["size"] = s
    ds = load_data(args.ds_name, "test", **kw)
    img = jnp.asarray(ds.data[args.sample_idx:args.sample_idx + 1])

    # image-domain row decimation (the reference applies SkipLines
    # directly to the image, mnist_inv_clf_sampling.py:63)
    lin_tfm = SkipLines(num_skip_lines=args.num_skip_lines, height=s)
    measurement = lin_tfm(img.astype(jnp.complex64))
    y_b = repeat_measurement(measurement, args.num_samples)

    module, params = reload_model(config, "Diffusion", args.ckpt_dir)
    sigmas = get_sigmas(config, "recons" if "recons" in config
                        else "unconditioned")
    clf_module, clf_params = reload_model(config, "Clf", args.clf_ckpt_dir)

    cfg = ALDConfig(
                    n_steps_each=args.num_steps_each or config.sampling.n_steps_each,
                    step_lr=args.step_lr or config.sampling.step_lr)
    check_ladder_stability(sigmas, cfg.n_steps_each, cfg.step_lr)
    cls = jnp.full((args.num_samples,), args.cls, jnp.int32)
    proximal = get_proximal(args.proximal)(lin_tfm=lin_tfm)
    recon = jax.device_get(jax.jit(
        lambda p, cp, y, k: ald_inverse_clf_proximal(
            make_score_fn(module, p, sigmas),
            lambda x: clf_module.apply({"params": cp}, x),
            cls, sigmas, y, lin_tfm, proximal, k, cfg,
            lr_scaled=args.lr_scaled, clf_lamda=args.clf_lamda,
            clf_start_time=args.clf_start_time,
            clf_step_type=args.clf_step_type))(
        params, clf_params, y_b, jax.random.PRNGKey(args.seed)))

    run_dir = save_artifacts(args.save_dir, vars(args), original=img,
                             measurement=measurement,
                             ZF=lin_tfm.conj_op(measurement),
                             reconstructions=recon)
    print(f"artifacts -> {run_dir}")
    return recon


if __name__ == "__main__":
    main()
