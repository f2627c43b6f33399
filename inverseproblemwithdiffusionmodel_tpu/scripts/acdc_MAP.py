"""ACDC MAP reconstruction, uniform line-skip mask.

Reference: scripts/acdc_MAP.py — UndersamplingFourier + MAP optimizer
(UFMAP). `acdc_MAP_keep_center` is the variable-density variant.
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
from ..operators import UndersamplingFourier
from ..samplers import MAPConfig, map_optimizer
from ..samplers.sigmas import get_sigmas
from ..utils.misc import add_phase
from ..utils.metrics import nrmse, ssim


def run_map(args, lin_tfm_factory):
    config = load_config(args.ds_name, "real-imag")
    config = apply_overrides(config, args.override)
    s = config.data.image_size
    kw = {"image_size": s}
    if args.data_root:
        kw["root_dir"] = args.data_root
    ds = load_data(args.ds_name, "test", **kw)
    img = jnp.asarray(ds.data[args.sample_idx:args.sample_idx + 1])

    key = jax.random.PRNGKey(args.seed)
    key, k_phase = jax.random.split(key)
    x_true = add_phase(img, k_phase)
    lin_tfm = lin_tfm_factory(s)
    measurement = lin_tfm(x_true)
    zf = lin_tfm.conj_op(measurement)

    module, params = reload_model(config, "Diffusion", args.ckpt_dir)
    sigmas = get_sigmas(config, "recons")

    cfg = MAPConfig(n_iters=args.n_iters or config.MAP.n_iters,
                    lr=args.lr or config.MAP.lr)
    recon_fn = jax.jit(lambda p, y: map_optimizer(
        make_score_fn(module, p, sigmas), y, lin_tfm, args.lamda, cfg))
    recon = jax.device_get(recon_fn(params, measurement))

    truth = np.abs(np.asarray(x_true[0]))
    m_nrmse = float(nrmse(jnp.abs(jnp.asarray(recon[0])), jnp.asarray(truth)))
    m_ssim = float(ssim(jnp.abs(jnp.asarray(recon[0, ..., 0])),
                        jnp.asarray(truth[..., 0])))
    print(f"MAP: NRMSE {m_nrmse:.4f}  SSIM {m_ssim:.4f}")
    run_dir = save_artifacts(args.save_dir, vars(args), original=x_true,
                             measurement=measurement, ZF=zf,
                             reconstructions=recon)
    print(f"artifacts -> {run_dir}")
    return recon


def main(argv=None):
    # MAP is a deterministic optimizer from x0 = A^H y: no chain ensemble
    p = add_common_args(argparse.ArgumentParser(), num_samples=False)
    p.add_argument("--ds_name", default="ACDC")
    p.add_argument("--num_skip_lines", type=int, default=2,
                   help="keep-stride: keep every Nth k-space line "
                        "(reference default 2 = R=2, acdc_MAP.py:30)")
    p.add_argument("--lamda", type=float, default=0.1, help="prior weight")
    p.add_argument("--n_iters", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--sample_idx", "--ds_idx", type=int, default=0,
                   help="test-set slice index (reference name: --ds_idx)")
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)

    def factory(s):
        return UndersamplingFourier.create(args.num_skip_lines, s)

    return run_map(args, factory)


if __name__ == "__main__":
    main()
