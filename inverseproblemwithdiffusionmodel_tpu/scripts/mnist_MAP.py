"""MNIST MAP inpainting (line-skip measurement).

Reference: scripts/mnist_MAP.py — `Inpainting` MAP optimizer over an
IMAGE-domain SkipLines measurement (linear_tfm = SkipLines applied
directly to the image, mnist_MAP.py:66; num_skip_lines is the keep-stride,
default 2 = keep every 2nd row, :29).
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
from ..samplers import MAPConfig, map_optimizer
from ..samplers.sigmas import get_sigmas
from ..utils.metrics import nrmse


def main(argv=None):
    # MAP is a deterministic optimizer from x0 = A^H y: no chain ensemble
    p = add_common_args(argparse.ArgumentParser(), num_samples=False)
    p.add_argument("--ds_name", default="MNIST")
    p.add_argument("--num_skip_lines", type=int, default=2,
                   help="keep-stride: keep every Nth image row "
                        "(reference default 2)")
    p.add_argument("--lamda", type=float, default=0.1)
    p.add_argument("--n_iters", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--sample_idx", "--ds_idx", type=int, default=0,
                   help="test-set slice index (reference name: --ds_idx)")
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)

    config = load_config(args.ds_name, "real-imag")
    config = apply_overrides(config, args.override)
    s = config.data.image_size
    kw = {"root_dir": args.data_root} if args.data_root else {}
    kw["size"] = s
    ds = load_data(args.ds_name, "test", **kw)
    img = jnp.asarray(ds.data[args.sample_idx:args.sample_idx + 1])
    x_true = img.astype(jnp.complex64)

    # image-domain row decimation (the reference's Inpainting problem)
    lin_tfm = SkipLines(num_skip_lines=args.num_skip_lines, height=s)
    measurement = lin_tfm(x_true)
    zf = lin_tfm.conj_op(measurement)

    module, params = reload_model(config, "Diffusion", args.ckpt_dir)
    sigmas = get_sigmas(config, "recons" if "recons" in config
                        else "unconditioned")

    cfg = MAPConfig(n_iters=args.n_iters or config.MAP.n_iters,
                    lr=args.lr or config.MAP.lr)
    recon = jax.device_get(jax.jit(lambda p, y: map_optimizer(
        make_score_fn(module, p, sigmas), y, lin_tfm, args.lamda, cfg))(
        params, measurement))

    print(f"MAP inpainting NRMSE "
          f"{float(nrmse(jnp.abs(jnp.asarray(recon[0])), jnp.abs(x_true[0]))):.4f}")
    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recon)
    print(f"artifacts -> {run_dir}")
    return recon


if __name__ == "__main__":
    main()
