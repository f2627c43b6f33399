"""Checkpoint-sweep ALD probes: quality + stability edge vs training step.

VERDICT r3 task 8: the 256^2 ALD-vs-MAP gap hypothesis ("needs the full
80k training budget") must become data. This probes every retained
training snapshot (examples/train_acdc_prior.py --snap_every) on the VAL
slice of the EXACT acdc_sense_ensemble.py 256^2 geometry — same dataset
draw, sigma ladder, mask, coil maps, phase — and appends one JSONL row
per (snapshot, kind, schedule) probe.

Probe protocol is REDUCED for cost (default 4 chains, n_steps_each 1 vs
the headline 16 x 3): probes share one PRNG key, so rows are comparable
ACROSS snapshots (same noise realization; only the params differ), and
trends — quality vs step, divergence edge vs step, EMA vs raw, constant
vs annealed schedule — are what this measures, not headline numbers.

Runs fine WHILE training runs (the relay interleaves programs; expect
~2x slower probes and ~proportional training slowdown while active).

  python examples/acdc_ckpt_sweep.py --run runs/acdc_prior_80k \
      --out runs/ckpt_sweep.jsonl
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import jax
_IPDM_CACHE = os.path.expanduser(
    "~/.cache/ipdm_jax_cpu"   # CPU AOT entries are machine-specific:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else "~/.cache/ipdm_jax")  # never share with the axon remote-compile cache


if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  _IPDM_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from acdc_sense_ensemble import make_dataset  # noqa: E402
from cine_2d_time_quality_matrix import BF16Wrap  # noqa: E402

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.models.registry import get_network
from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
    _exp_sens_map)
from inverseproblemwithdiffusionmodel_tpu.operators.masks import (
    random_cartesian_mask)
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairSENSE, PairL2Penalty)
from inverseproblemwithdiffusionmodel_tpu.ops.resize import (
    resize_align_corners)
from inverseproblemwithdiffusionmodel_tpu.samplers import ALDConfig
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    make_stepped_pair_reconstructor)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)
from inverseproblemwithdiffusionmodel_tpu.utils.metrics import nrmse, ssim


def log(msg):
    print(f"[sweep] {msg}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs/acdc_prior_80k")
    p.add_argument("--out", default="runs/ckpt_sweep.jsonl")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--ngf", type=int, default=128)
    p.add_argument("--levels", type=int, default=2311)
    p.add_argument("--n_steps_each", type=int, default=1)
    p.add_argument("--step_lr", type=float, default=9e-7)
    p.add_argument("--chains", type=int, default=4)
    p.add_argument("--R", type=int, default=8)
    p.add_argument("--center_frac", type=float, default=1 / 16)
    p.add_argument("--num_sens", type=int, default=4)
    p.add_argument("--lr_grid", type=float, nargs="*",
                   default=[3e5, 1.2e6],
                   help="constant-schedule lr_scaled probes (EMA params); "
                        "pass with no values to probe raw/anneal only")
    p.add_argument("--anneal_lr", type=float, default=1.2e6,
                   help="annealed-schedule probe weight (0 disables)")
    p.add_argument("--anneal_start", type=float, default=0.01)
    p.add_argument("--raw_lr", type=float, nargs="*", default=[3e5],
                   help="raw (non-EMA) params probe weights (grid; pass "
                        "with no values to disable)")
    p.add_argument("--snap_min", type=int, default=0,
                   help="skip snapshots below this step")
    p.add_argument("--cg_iters", type=int, default=6,
                   help="CG iterations in the proximal solve. <6 probes a "
                        "DAMPED (partial) prox — the reference's DC is a "
                        "single 5e-2 SGD step (proximal_op.py:20-51), far "
                        "gentler than an exact solve, which may be why its "
                        "recipe tolerates much higher lr_scaled")
    p.add_argument("--eval_slice", default="val", choices=["val", "test"],
                   help="val = tuning slice (default, trend probes); "
                        "test = held-out reported slice (final numbers)")
    p.add_argument("--n_probes", type=int, default=1,
                   help="accumulate N x chains with distinct keys into one "
                        "ensemble row (mean over N*chains chains)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    S = args.size

    # ---- EXACT acdc_sense_ensemble geometry ---------------------------
    data = make_dataset(400, S, args.seed)
    sigma_max = max_pairwise_distance(data, max_samples=256)
    sigmas = sigma_ladder(sigma_max, 0.01, args.levels)
    del data
    test = make_dataset(2, S, args.seed + 777)
    mask = random_cartesian_mask(S, args.R, args.center_frac,
                                 seed=args.seed).reshape(1, 1, S, 1)
    maps = np.stack([_exp_sens_map(S, S, args.seed + i)
                     for i in range(args.num_sens)])
    maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))
    patch = jax.random.normal(jax.random.PRNGKey(args.seed + 3),
                              (2, 5, 5, 1))
    phase = resize_align_corners(patch, (S, S), axes=(1, 2))

    # slice 0 = held-out test (reported), slice 1 = val (tuning) — the
    # ensemble script's convention
    si = 0 if args.eval_slice == "test" else 1
    truth = jnp.asarray(test[si:si + 1])
    xr_t = truth * jnp.cos(phase[si:si + 1])
    xi_t = truth * jnp.sin(phase[si:si + 1])
    B = args.chains
    opB = PairSENSE(
        mask=jnp.asarray(np.tile(mask, (B, 1, 1, 1)), jnp.float32),
        sens_re=jnp.asarray(maps[..., None], jnp.float32),
        sens_im=jnp.zeros((args.num_sens, S, S, 1), jnp.float32))
    op1 = PairSENSE(
        mask=jnp.asarray(np.tile(mask, (1, 1, 1, 1)), jnp.float32),
        sens_re=jnp.asarray(maps[..., None], jnp.float32),
        sens_im=jnp.zeros((args.num_sens, S, S, 1), jnp.float32))
    yr1, yi1 = op1(xr_t, xi_t)
    yrB = jnp.tile(yr1, (1, B, 1, 1, 1))
    yiB = jnp.tile(yi1, (1, B, 1, 1, 1))

    config = Config({"data": {"channels": 1, "image_size": S,
                              "logit_transform": False, "rescaled": False},
                     "model": {"ngf": args.ngf, "nonlinearity": "elu",
                               "normalization": "InstanceNorm++"}})
    module = get_network(config)
    fwd = module if jax.default_backend() == "cpu" else BF16Wrap(module)
    cfg = ALDConfig(n_steps_each=args.n_steps_each, step_lr=args.step_lr)

    x0 = jnp.zeros((B, S, S, 1))
    p0 = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                              jnp.ones((B,)))["params"]
    from flax import serialization

    def load(path):
        params = serialization.from_bytes(p0, open(path, "rb").read())
        return jax.device_put(params)

    recons = {}

    def probe(params, lr_scaled, schedule, emit=None, resume_key=None):
        keyname = (lr_scaled, schedule)
        if keyname not in recons:
            lrs = lr_scaled if schedule.startswith("const") else \
                np.geomspace(args.anneal_start * lr_scaled, lr_scaled,
                             args.levels)
            # (schedule label already encodes anneal_start; one process
            # only ever runs a single --anneal_start value)
            recons[keyname] = make_stepped_pair_reconstructor(
                fwd, sigmas, opB,
                PairL2Penalty.with_normal_kernel(
                    opB, num_iters=args.cg_iters), cfg,
                lr_scaled=lrs)
        t0 = time.time()
        # Per-probe DATA persistence (not just metrics): the running
        # magnitude sum + probe count live in an .npz next to --out, so a
        # relay wedge mid-ensemble costs at most one probe (~20 min at
        # 256^2), and a later invocation with a larger --n_probes EXTENDS
        # the ensemble without recomputing chains 0..k-1. The fold_in
        # (PRNGKey(seed+50), k) schedule makes probe k deterministic.
        acc, k0, rf = None, 0, None
        if resume_key is not None:
            rf = f"{args.out}.resume_{resume_key}.npz"
            if os.path.exists(rf):
                z = np.load(rf)
                acc, k0 = z["sum"], int(z["k"])
                log(f"resuming {resume_key} at probe {k0} "
                    f"({k0 * B} chains done)")
        for k in range(k0, args.n_probes):
            key = jax.random.PRNGKey(args.seed + 50) if k == 0 else \
                jax.random.fold_in(jax.random.PRNGKey(args.seed + 50), k)
            xr, xi = recons[keyname](params, yrB, yiB, key)
            m = np.sqrt(np.asarray(xr, np.float64) ** 2
                        + np.asarray(xi, np.float64) ** 2).sum(axis=0)
            acc = m if acc is None else acc + m
            if rf is not None:
                np.savez(rf + ".tmp.npz", sum=acc, k=k + 1)
                os.replace(rf + ".tmp.npz", rf)
            if emit is not None and k + 1 < args.n_probes:
                # incremental cumulative-ensemble row (partial result is
                # persisted even if the remaining probes never finish)
                pm = jnp.asarray((acc / ((k + 1) * B)).astype(np.float32))
                emit((k + 1) * B, float(nrmse(pm, truth[0])),
                     float(ssim(pm[..., 0], truth[0][..., 0])),
                     time.time() - t0)
        mag = jnp.asarray((acc / (args.n_probes * B)).astype(np.float32))
        n = float(nrmse(mag, truth[0]))
        s = float(ssim(mag[..., 0], truth[0][..., 0]))
        return n, s, time.time() - t0

    # done-set keeps the MAX completed chain count per job key: a rerun
    # with a larger --n_probes re-queues the job and the resume .npz
    # extends the ensemble from where the completed run stopped
    done = {}
    if os.path.exists(args.out):
        for line in open(args.out):
            try:
                r = json.loads(line)
                if r.get("partial"):
                    continue  # cumulative-ensemble checkpoints don't
                    # complete a job — rerun resumes it via the .npz
                k = (r["step"], r["kind"], r["lr_scaled"], r["schedule"],
                     r.get("n_steps_each"))
                done[k] = max(done.get(k, 0), r.get("chains", 0))
            except Exception:
                pass

    jobs = []
    for path in sorted(glob.glob(os.path.join(args.run,
                                              "prior_*.msgpack"))):
        step = int(os.path.basename(path)[6:-8])
        if step < args.snap_min:
            continue
        for lr in args.lr_grid:
            jobs.append((step, "ema", lr, "const", path))
        if args.anneal_lr:
            # label carries the ramp start so different --anneal_start
            # probes don't collide in the done-set ("anneal" == the
            # legacy 0.01-start rows)
            sched = ("anneal" if args.anneal_start == 0.01
                     else f"anneal{args.anneal_start:g}")
            jobs.append((step, "ema", args.anneal_lr, sched, path))
        raw = os.path.join(args.run, f"raw_{step:06d}.msgpack")
        if args.raw_lr and os.path.exists(raw):
            for lr in args.raw_lr:
                jobs.append((step, "raw", lr, "const", raw))
    if args.cg_iters != 6:
        # damped-prox probes: cg-suffixed labels (dedicated invocation)
        jobs = [(s, k, lr, f"{sc}-cg{args.cg_iters}", p2)
                for s, k, lr, sc, p2 in jobs]
    jobs = [j for j in jobs
            if done.get(j[:4] + (args.n_steps_each,), -1)
            < B * args.n_probes]
    log(f"{len(jobs)} probes queued "
        f"(chains={B}, n_steps_each={args.n_steps_each})")
    # run id distinguishes partial rows from different invocations of the
    # same job (stale partials from a wedged run vs a fresh rerun)
    run_id = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())

    last_path, params = None, None
    for step, kind, lr, schedule, path in jobs:
        if path != last_path:
            params = load(path)
            last_path = path
        def emit(nch, pn, ps, pwall, _step=step, _kind=kind, _lr=lr,
                 _schedule=schedule):
            prow = {"step": _step, "kind": _kind, "lr_scaled": _lr,
                    "schedule": _schedule, "nrmse": round(pn, 4),
                    "ssim": round(ps, 4), "wall_s": round(pwall, 1),
                    "chains": nch, "slice": args.eval_slice,
                    "n_steps_each": args.n_steps_each,
                    "eff_weight": round(args.step_lr * _lr, 3),
                    "R": args.R, "partial": True, "run": run_id,
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime())}
            with open(args.out, "a") as f:
                f.write(json.dumps(prow) + "\n")
            log(json.dumps(prow))

        rkey = f"{step}_{kind}_{lr:g}_{schedule}_n{args.n_steps_each}"
        n, s, wall = probe(params, lr, schedule,
                           emit=emit if args.n_probes > 1 else None,
                           resume_key=rkey if args.n_probes > 1 else None)
        row = {"step": step, "kind": kind, "lr_scaled": lr,
               "schedule": schedule, "nrmse": round(n, 4),
               "ssim": round(s, 4), "wall_s": round(wall, 1),
               "chains": B * args.n_probes, "slice": args.eval_slice,
               "n_steps_each": args.n_steps_each,
               "eff_weight": round(args.step_lr * lr, 3),
               "R": args.R, "run": run_id,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        log(json.dumps(row))


if __name__ == "__main__":
    main()
