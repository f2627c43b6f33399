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
from ..models import NCSNpp, DDPM
from ..sde import get_sampling_fn, get_score_fn
from ..training import TrainState, get_optimizer, Checkpointer


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

    config = get_continuous_config(args.config)
    if args.override:
        import yaml
        config = config.replace(**{k: yaml.safe_load(v) for k, _, v in
                                   (o.partition("=") for o in args.override)})
    if args.method:
        config = config.replace(**{"sampling.method": args.method})

    module = (DDPM if config.model.name == "ddpm" else NCSNpp)(config=config)
    sde = make_sde(config)
    s = config.data.image_size
    shape = (args.num_samples, s, s, config.data.num_channels)
    x0 = jnp.zeros((1, s, s, config.data.num_channels))
    cond0 = (jnp.zeros((1,)) if config.model.embedding_type == "positional"
             else jnp.ones((1,)))
    params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                  cond0)["params"]
    if args.ckpt_dir:
        state = TrainState.create(params, get_optimizer(config),
                                  ema_decay=config.model.ema_rate)
        ckpt = Checkpointer(args.ckpt_dir, track_best=False)
        state = ckpt.restore(state)
        ckpt.close()
        params = state.eval_params
        print(f"restored step {int(state.step)} from {args.ckpt_dir}")
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
