"""Production-scale 2D+time serving demo on real hardware (VERDICT r4
task 5): load the cine-matrix priors, build a `CineReconstructionEngine`
at 128^2 T=24 with a >=48-chain ensemble, then serve >=3 requests with
varied per-frame masks from ONE compiled program.

Records what a deployment cares about: compile (warmup) time, per-request
latency, chain-steps/s, reconstruction quality vs the synthetic truth,
and `stats()["jit_cache_size"]` across requests — the zero-recompile
contract (per-request masks enter the compiled program as arguments;
serving/cine.py docstring; reference 105-mean production story:
/root/reference/helpers/visualizations.py:117-120).

  python examples/cine_serving_demo.py \\
      --priors runs/cine_matrix_r5_128/priors --size 128 --ngf_s 64 \\
      --ngf_t 128 --chains 48 --levels 116 --out runs/cine_serving_demo
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
_IPDM_CACHE = os.path.expanduser(
    "~/.cache/ipdm_jax_cpu"
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else "~/.cache/ipdm_jax")
jax.config.update("jax_compilation_cache_dir", _IPDM_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.data.datasets import synthetic_cine
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.models.ncsn1d import NCSN1D
from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
    MASK_PRESETS, _exp_sens_map)
from inverseproblemwithdiffusionmodel_tpu.operators.masks import generate_mask
from inverseproblemwithdiffusionmodel_tpu.operators.pair import PairSENSE
from inverseproblemwithdiffusionmodel_tpu.ops.resize import (
    resize_align_corners)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.serving.cine import (
    CineEngineSpec, CineReconstructionEngine)
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)
from inverseproblemwithdiffusionmodel_tpu.utils.metrics import nrmse, ssim
from inverseproblemwithdiffusionmodel_tpu.utils.reshape import (
    reshape_temporal_dim_np)


def log(msg):
    print(f"[serve-demo] {msg}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--priors", default="runs/cine_matrix_r5_128/priors",
                   help="dir with spatial.msgpack + temporal.msgpack from "
                        "examples/cine_2d_time_quality_matrix.py")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--T", type=int, default=24)
    p.add_argument("--win", type=int, default=8)
    p.add_argument("--ngf_s", type=int, default=64)
    p.add_argument("--ngf_t", type=int, default=128)
    p.add_argument("--n_train", type=int, default=60,
                   help="regenerate the matrix run's training set to "
                        "recover its sigma ladders (deterministic seed)")
    p.add_argument("--levels", type=int, default=116,
                   help="serving ladder length (deployment latency knob; "
                        "the research protocol uses 232)")
    p.add_argument("--levels_t", type=int, default=120)
    p.add_argument("--n_steps_each", type=int, default=3)
    p.add_argument("--step_lr", type=float, default=6.2e-6)
    p.add_argument("--lr_scaled", type=float, default=3e5)
    p.add_argument("--lamda_T", type=float, default=10.0)
    p.add_argument("--chains", type=int, default=48)
    p.add_argument("--R", type=int, default=8)
    p.add_argument("--requests", type=int, default=3)
    p.add_argument("--quick", action="store_true",
                   help="tiny spec smoke (CPU-friendly; random params if "
                        "no priors on disk)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/cine_serving_demo")
    args = p.parse_args(argv)
    if args.quick:
        args.size, args.T, args.win = 32, 8, 4
        args.ngf_s, args.ngf_t = 16, 16
        args.n_train, args.levels, args.levels_t = 8, 12, 8
        args.chains, args.requests = 4, 3
    os.makedirs(args.out, exist_ok=True)
    S, T, win = args.size, args.T, args.win

    # ---- sigma ladders from the matrix run's training data (same seed) --
    vids = synthetic_cine(args.n_train + 2, T, S, S, seed=args.seed)
    train_vids, test_vids = vids[:-2], vids[-2:]
    frames = train_vids.reshape(-1, S, S)[..., None]
    tubes = reshape_temporal_dim_np(train_vids, win, win)
    sigmas_S = sigma_ladder(max_pairwise_distance(frames, max_samples=256),
                            0.01, args.levels)
    sigmas_T = sigma_ladder(max_pairwise_distance(tubes, max_samples=256),
                            0.01, args.levels_t)

    # ---- modules + priors (matrix-run construction, msgpack reload) -----
    cfg_s = Config({"data": {"channels": 1, "image_size": S,
                             "logit_transform": False, "rescaled": False},
                    "model": {"ngf": args.ngf_s, "nonlinearity": "elu",
                              "normalization": "InstanceNorm++"}})
    module_S = NCSNv2(config=cfg_s)
    cfg_t = Config({"data": {"channels": win * win, "image_size": T,
                             "logit_transform": False, "rescaled": False},
                    "model": {"ngf": args.ngf_t, "nonlinearity": "elu",
                              "normalization": "InstanceNorm++"}})
    module_T = NCSN1D(cfg_t)

    from flax import serialization

    def load(module, x_shape, path, tag):
        p0 = jax.jit(module.init)(jax.random.PRNGKey(0),
                                  jnp.zeros(x_shape), jnp.ones((2,)))["params"]
        if os.path.exists(path):
            p0 = serialization.from_bytes(p0, open(path, "rb").read())
            log(f"loaded {tag} prior: {path}")
        elif args.quick:
            log(f"quick mode: no {tag} prior on disk, using init params")
        else:
            raise SystemExit(f"missing prior {path} — run "
                             "examples/cine_2d_time_quality_matrix.py first")
        return jax.device_put(p0)

    params_S = load(module_S, (2, S, S, 1),
                    os.path.join(args.priors, "spatial.msgpack"), "spatial")
    params_T = load(module_T, (2, T, win * win),
                    os.path.join(args.priors, "temporal.msgpack"), "temporal")

    # ---- engine ---------------------------------------------------------
    spec = CineEngineSpec(
        height=S, width=S, frames=T, num_sens=4, chains=args.chains,
        n_steps_each=args.n_steps_each, step_lr=args.step_lr,
        lr_scaled=args.lr_scaled, mode_T="diffusion1d",
        lamda_T=args.lamda_T, win_size=win, if_random_shift=True,
        prox_iters=4, dtype="bf16" if jax.default_backend() != "cpu"
        else "f32", mode="steps")
    preset = MASK_PRESETS.get(int(args.R))
    mask0 = generate_mask(T, S, seed=args.seed + args.R,
                          **preset).reshape(T, 1, S, 1)
    maps = np.stack([_exp_sens_map(S, S, args.seed + i) for i in range(4)])
    maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))
    sens_re = maps[..., None].astype(np.float32)
    sens_im = np.zeros((4, S, S, 1), np.float32)

    engine = CineReconstructionEngine(
        module_S, params_S, sigmas_S, spec=spec,
        module_T=module_T, params_T=params_T, sigmas_T=sigmas_T,
        mask=mask0, sens_re=sens_re, sens_im=sens_im)

    log(f"spec: {spec}")
    t_warm = engine.warmup()
    log(f"warmup (compile + first run): {t_warm:.1f}s")

    # ---- ground truth + requests with varied masks ----------------------
    truth = np.asarray(test_vids[0])                       # (T, S, S)
    patch = jax.random.normal(jax.random.PRNGKey(args.seed + 3),
                              (2, 5, 5, 1))
    phase = np.asarray(resize_align_corners(patch, (S, S), axes=(1, 2)))[0]
    xr = (truth[..., None] * np.cos(phase)).astype(np.float32)
    xi = (truth[..., None] * np.sin(phase)).astype(np.float32)

    rows = []
    for req in range(args.requests):
        # per-request mask: a fresh variable-density draw (the serving
        # contract: masks are program ARGUMENTS, zero recompiles)
        mask = generate_mask(T, S, seed=args.seed + args.R + 17 * req,
                             **preset).reshape(T, 1, S, 1)
        op = PairSENSE(mask=jnp.asarray(mask, jnp.float32),
                       sens_re=jnp.asarray(sens_re),
                       sens_im=jnp.asarray(sens_im))
        yr, yi = op(jnp.asarray(xr), jnp.asarray(xi))      # (4, T, S, S, 1)
        res = engine.reconstruct(np.asarray(yr), np.asarray(yi),
                                 mask=mask, sens_re=sens_re,
                                 sens_im=sens_im, seed=100 + req)
        mag = res.mean_mag[..., 0]                          # (T, S, S)
        n = float(nrmse(jnp.asarray(mag), jnp.asarray(truth)))
        s = float(np.mean([float(ssim(jnp.asarray(mag[f]),
                                      jnp.asarray(truth[f])))
                           for f in range(T)]))
        st = engine.stats()
        row = {"request": req, "latency_s": round(res.latency_s, 1),
               "chain_steps_per_s": round(res.chain_steps_per_s, 1),
               "nrmse": round(n, 4), "ssim": round(s, 4),
               "jit_cache_size": st["jit_cache_size"]}
        rows.append(row)
        log(json.dumps(row))

    stats = engine.stats()
    caches = [r["jit_cache_size"] for r in rows]
    stable = all(c == caches[0] for c in caches)
    out = {"args": vars(args), "warmup_s": round(t_warm, 1),
           "requests": rows, "jit_cache_stable": stable,
           "stats": {k: v for k, v in stats.items() if k != "spec"}}
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(out, f, indent=2)
    log(f"jit cache stable across {args.requests} requests: {stable}")
    log(json.dumps({"warmup_s": out["warmup_s"],
                    "mean_latency_s": stats["mean_latency_s"]}))
    if not stable:
        raise SystemExit("recompile detected across requests")
    return out


if __name__ == "__main__":
    main()
