"""Continuous-stack prior sampling: NCSN++/DDPM with VE/VP/subVP PC or ODE
samplers.

The reference exposes this path only through the validation callback
(helpers/pl_callbacks.py:124-150); here it is a first-class CLI over the
configs_continuous tree, e.g.:

  python -m inverseproblemwithdiffusionmodel_tpu.scripts.pc_sampling \\
      --config ve/cifar10_ncsnpp_continuous --num_samples 4
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ._common import save_artifacts
from ..configs_continuous import get_continuous_config, make_sde
from ..models.registry import create_model
from ..sde import get_sampling_fn, get_score_fn
from ..training import Checkpointer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ve/cifar10_ncsnpp_continuous")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--method", default=None, choices=[None, "pc", "ode"])
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--save_dir", default="outputs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VALUE")
    args = p.parse_args(argv)

    from ._common import apply_overrides
    config = apply_overrides(get_continuous_config(args.config),
                             args.override)
    if args.method:
        config = config.replace(**{"sampling.method": args.method})

    # registry dispatch (like import_torch_checkpoint): covers ncsnpp/ddpm
    # AND the discrete-zoo names the config tree registers (ncsn,
    # ncsn_deeper, ncsnv2_64/128/256)
    module = create_model(config)
    sde = make_sde(config)
    s = config.data.image_size
    shape = (args.num_samples, s, s, config.data.num_channels)
    x0 = jnp.zeros((1, s, s, config.data.num_channels))
    if config.model.name in ("ncsn", "ncsn_deeper"):
        cond0 = jnp.zeros((1,), jnp.int32)   # v1: integer ladder labels
    elif config.model.get("embedding_type") == "positional":
        cond0 = jnp.zeros((1,))
    else:
        cond0 = jnp.ones((1,))
    params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                  cond0)["params"]
    if args.ckpt_dir:
        # params-only, structure-agnostic (see _common.reload_model)
        ckpt = Checkpointer(args.ckpt_dir, track_best=False)
        loaded, step = ckpt.restore_params(use_ema=True)
        ckpt.close()
        params = jax.tree_util.tree_map(jnp.asarray, loaded)
        print(f"restored step {step} from {args.ckpt_dir}")
    else:
        print("WARNING: sampling with FRESH random weights (no --ckpt_dir)")

    sampling_fn = get_sampling_fn(config, sde, shape)

    @jax.jit
    def sample(params, key):
        model_fn = lambda x, cond: module.apply({"params": params}, x, cond)
        score_fn = get_score_fn(sde, model_fn,
                                continuous=config.training.continuous)
        x, nfe = sampling_fn(score_fn, key)
        return x, nfe

    samples, nfe = sample(params, jax.random.PRNGKey(args.seed))
    samples = np.asarray(jax.device_get(samples))
    run_dir = save_artifacts(args.save_dir, vars(args), samples=samples)
    print(f"{samples.shape} samples (nfe={int(nfe)}) -> {run_dir}")
    return samples


if __name__ == "__main__":
    main()
