"""Class-conditional MNIST inverse sampling (ALD + classifier guidance +
data-consistency gradient).

Reference: scripts/mnist_inv_clf_sampling.py — the script imports the
deleted `ALDInvClf`; the sampler is re-grown from `compute_clf_grad`
(ncsn/models/__init__.py:172) as samplers.ald_inverse_clf.
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
from ..operators import SkipLines
from ..parallel import repeat_measurement
from ..samplers import (ALDConfig, ald_inverse_clf,
                        check_ladder_stability)
from ..samplers.sigmas import get_sigmas


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument("--ds_name", default="MNIST")
    p.add_argument("--cls", type=int, default=3, help="target class")
    p.add_argument("--num_skip_lines", type=int, default=2,
                   help="keep-stride: keep every Nth image row "
                        "(reference default 2)")
    p.add_argument("--lamda", type=float, default=1.0,
                   help="data-consistency weight")
    p.add_argument("--clf_lamda", type=float, default=1.0)
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

    config = load_config(args.ds_name)
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
    sigmas = get_sigmas(config)
    clf_module, clf_params = reload_model(config, "Clf", args.clf_ckpt_dir)

    cfg = ALDConfig(
                    n_steps_each=args.num_steps_each or config.sampling.n_steps_each,
                    step_lr=args.step_lr or config.sampling.step_lr)
    check_ladder_stability(sigmas, cfg.n_steps_each, cfg.step_lr)
    cls = jnp.full((args.num_samples,), args.cls, jnp.int32)
    recon = jax.device_get(jax.jit(lambda p, cp, y, k: ald_inverse_clf(
        make_score_fn(module, p, sigmas),
        lambda x: clf_module.apply({"params": cp}, x),
        cls, sigmas, y, lin_tfm, args.lamda, k, cfg,
        clf_lamda=args.clf_lamda))(params, clf_params, y_b,
                                   jax.random.PRNGKey(args.seed)))

    run_dir = save_artifacts(args.save_dir, vars(args), original=img,
                             measurement=measurement,
                             ZF=lin_tfm.conj_op(measurement),
                             reconstructions=recon)
    print(f"artifacts -> {run_dir}")
    return recon


if __name__ == "__main__":
    main()
