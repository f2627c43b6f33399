"""ACDC SENSE TV-regularized least-squares baseline.

Reference: scripts/acdc_SENSE_TV.py — kornia TotalVariation inside a
Lightning "training" loop (TrainMAPModel); here a jitted optax scan
(samplers.tv_reconstruction).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ._common import apply_overrides, add_common_args, save_artifacts
from ..config import load_config
from ..data import load_data
from ..operators import make_sense
from ..samplers import MAPConfig, tv_reconstruction
from ..utils.misc import add_phase
from ..utils.metrics import nrmse, ssim


def main(argv=None):
    # TV is prior-free (no score checkpoint) and deterministic (no ensemble)
    p = add_common_args(argparse.ArgumentParser(), num_samples=False,
                        ckpt=False)
    p.add_argument("--ds_name", default="ACDC")
    p.add_argument("--R", type=int, default=8, choices=[8, 16, 20])
    p.add_argument("--num_sens", type=int, default=4)
    p.add_argument("--sens_type", default="exp", choices=["exp"],
                   help="synthetic coil-map family (reference default exp)")
    p.add_argument("--center_lines_frac", type=float, default=1 / 16)
    p.add_argument("--reg_weight", type=float, default=1e-3)
    p.add_argument("--n_iters", "--num_epochs", type=int, default=None,
                   help="Adam iterations (reference name: "
                        "--num_epochs, Lightning epochs over the "
                        "single measurement)")
    p.add_argument("--log_dir", default=None,
                   help="accepted for reference CLI compatibility; "
                        "alias of --save_dir")
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference CLI compatibility; "
                        "unused — the C++ prefetch batcher replaces "
                        "torch DataLoader workers")

    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--sample_idx", "--ds_idx", type=int, default=0,
                   help="test-set slice index (reference name: --ds_idx)")
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)
    if args.log_dir:
        args.save_dir = args.log_dir

    config = load_config(args.ds_name, "real-imag")
    config = apply_overrides(config, args.override)
    s = config.data.image_size
    kw = {"image_size": s}
    if args.data_root:
        kw["root_dir"] = args.data_root
    ds = load_data(args.ds_name, "test", **kw)
    img = jnp.asarray(ds.data[args.sample_idx:args.sample_idx + 1])

    key = jax.random.PRNGKey(args.seed)
    x_true = add_phase(img, key)
    lin_tfm = make_sense(args.sens_type, args.num_sens, args.R,
                         args.center_lines_frac, (s, s, 1), seed=args.seed,
                         num_frames=1)
    measurement = lin_tfm(x_true)
    zf = lin_tfm.conj_op(measurement)

    cfg = MAPConfig(n_iters=args.n_iters or config.MAP.n_iters,
                    lr=args.lr or config.MAP.lr)
    recon = jax.device_get(jax.jit(lambda y: tv_reconstruction(
        y, lin_tfm, args.reg_weight, cfg))(measurement))

    truth = np.abs(np.asarray(x_true[0]))
    print(f"TV: NRMSE {float(nrmse(jnp.abs(jnp.asarray(recon[0])), jnp.asarray(truth))):.4f}  "
          f"SSIM {float(ssim(jnp.abs(jnp.asarray(recon[0, ..., 0])), jnp.asarray(truth[..., 0]))):.4f}")
    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recon)
    print(f"artifacts -> {run_dir}")
    return recon


if __name__ == "__main__":
    main()
