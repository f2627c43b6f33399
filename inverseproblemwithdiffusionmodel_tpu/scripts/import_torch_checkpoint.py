"""Import a reference PyTorch (Lightning) checkpoint into an orbax
checkpoint every reconstruction CLI here can consume via ``--ckpt_dir``.

Migration path for users of the reference repo: their trained score priors
live in PL ``.ckpt`` files with EMA weights under
``callbacks.EMA.ema_state_dict`` (helpers/pl_callbacks.py:110-121); this
converts the NCSNv2-family weights (``Diffusion`` -> NCSNv2Deepest,
``Diffusion1D`` -> NCSN1D; helpers/load_model.py:23-31) to channel-last
Flax params and writes {params, ema, opt_state, step} with orbax.

  python -m inverseproblemwithdiffusionmodel_tpu.scripts.import_torch_checkpoint \\
      --ckpt_path last.ckpt --ds_name ACDC --task_name Diffusion \\
      --mode real-imag --out_dir runs/imported/ckpts

Continuous-stack checkpoints (score_sde-style NCSN++/DDPM/NCSNv2 zoo,
models/ncsnpp.py, models/ddpm.py, models/ncsnv2.py — the converter
dispatches on ``config.model.name``) import through
``--continuous <config path>`` instead of --ds_name:

  python -m ... --ckpt_path ncsnpp.pth \\
      --continuous ve/cifar10_ncsnpp_continuous --out_dir runs/imported
"""
from __future__ import annotations

import argparse

from ._common import apply_overrides
from ..config import load_config
from ..models.registry import load_model
from ..training import TrainState, get_optimizer, Checkpointer
from ..utils.torch_import import (convert_continuous_state_dict,
                                  convert_ncsn_state_dict,
                                  load_torch_checkpoint)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_path", required=True,
                   help="reference PL .ckpt or bare state-dict .pth")
    p.add_argument("--ds_name",
                   help="discrete-stack dataset config (NCSNv2 family)")
    p.add_argument("--continuous",
                   help="continuous-stack config path (NCSN++), e.g. "
                        "ve/cifar10_ncsnpp_continuous")
    p.add_argument("--task_name", default="Diffusion",
                   choices=["Diffusion", "Diffusion1D", "Diffusion3D"])
    p.add_argument("--mode", default="real-imag")
    p.add_argument("--out_dir", required=True,
                   help="orbax checkpoint dir to write")
    p.add_argument("--raw_weights", action="store_true",
                   help="import the raw training weights instead of EMA")
    p.add_argument("--override", action="append", default=[],
                   help="dotted config overrides, e.g. model.ngf=128")
    args = p.parse_args(argv)
    if bool(args.ds_name) == bool(args.continuous):
        p.error("exactly one of --ds_name / --continuous is required")

    if args.continuous:
        import jax
        import jax.numpy as jnp
        from ..configs_continuous import get_continuous_config
        from ..models.registry import create_model

        config = apply_overrides(get_continuous_config(args.continuous),
                                 args.override)
        module = create_model(config)
        S = config.data.image_size
        x = jnp.zeros((1, S, S, config.data.num_channels))
        # ncsnpp/ddpm/ncsnv2_* condition on continuous time / sigma VALUES;
        # the v1 `ncsn` conditions on integer ladder labels
        if config.model.name in ("ncsn", "ncsn_deeper"):
            tc = jnp.zeros((1,), jnp.int32)
        else:
            tc = jnp.ones((1,))
        template = jax.jit(module.init)(jax.random.PRNGKey(0), x,
                                        tc)["params"]
        torch_sd = load_torch_checkpoint(args.ckpt_path,
                                         use_ema=not args.raw_weights)
        print(f"[import] loaded {len(torch_sd)} torch tensors from "
              f"{args.ckpt_path}")
        params = convert_continuous_state_dict(torch_sd, template, config)
    else:
        config = apply_overrides(load_config(args.ds_name, args.mode),
                                 args.override)
        module, template = load_model(config, args.task_name)
        torch_sd = load_torch_checkpoint(args.ckpt_path,
                                         use_ema=not args.raw_weights)
        print(f"[import] loaded {len(torch_sd)} torch tensors from "
              f"{args.ckpt_path}")
        params = convert_ncsn_state_dict(torch_sd, template)
    print("[import] converted to flax params (all leaves matched)")

    state = TrainState.create(params, get_optimizer(config), ema_decay=0.999)
    ckpt = Checkpointer(args.out_dir, track_best=False)
    ckpt.save(0, state)
    ckpt.close()
    print(f"[import] wrote orbax checkpoint to {args.out_dir} "
          f"(pass as --ckpt_dir to any sampling script)")


if __name__ == "__main__":
    main()
