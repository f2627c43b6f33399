"""ACDC SENSE ensemble experiment: the reference's README headline claim
(README.md:12 — "mean of 105 [ALD] reconstructions ... outperforms MAP and
TV") run hermetically on synthetic short-axis cardiac slices.

Trains an NCSNv2 score prior, then reconstructs an R=40 4-coil SENSE
measurement (uniform Cartesian lines + guaranteed center band, the
reference's commented-out uniform-mask path at
ncsn/linear_transforms/undersampling_fourier.py:50-61) with:

  ZF | ALD ensemble mean (--chains, default 105) | MAP | TV

MAP prior weight and TV regularizer weight are tuned on a validation
slice; all methods report on a held-out test slice. Runs in the real-pair
pipeline (no complex dtypes, TPU fast path).

  python examples/acdc_sense_ensemble.py \\
      [--quick] [--steps 12000] [--chains 105] [--out runs/acdc_sense]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax

# Honor JAX_PLATFORMS explicitly: the axon sitecustomize pins jax_platforms
# at interpreter start, so the env var alone is ignored (a CPU-pinned smoke
# would silently hit the TPU relay — and queue behind any live training run)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
_IPDM_CACHE = os.path.expanduser(
    "~/.cache/ipdm_jax_cpu"   # CPU AOT entries are machine-specific:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else "~/.cache/ipdm_jax")  # never share with the axon remote-compile cache


jax.config.update("jax_compilation_cache_dir",
                  _IPDM_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cine_2d_time_quality_matrix import BF16Wrap, train_score_net  # noqa: E402

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.data.datasets import (
    synthetic_acdc_slice)
from inverseproblemwithdiffusionmodel_tpu.data import transforms as dT
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
    _exp_sens_map)
from inverseproblemwithdiffusionmodel_tpu.operators.masks import (
    random_cartesian_mask)
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairSENSE, PairL2Penalty)
from inverseproblemwithdiffusionmodel_tpu.ops.resize import (
    resize_align_corners)
from inverseproblemwithdiffusionmodel_tpu.samplers import (
    ALDConfig, MAPConfig, map_optimizer_pair, tv_reconstruction_pair)
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    make_stepped_pair_reconstructor)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
    sigma_ladder, check_ladder_stability)
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_score_train_step)
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)
from inverseproblemwithdiffusionmodel_tpu.utils.metrics import nrmse, ssim


def log(msg):
    print(f"[acdc] {msg}", flush=True)


def make_dataset(n: int, size: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    out = np.empty((n, size, size, 1), np.float32)
    for i in range(n):
        img, _ = synthetic_acdc_slice(rng)
        img = dT.scale_intensity(img)
        out[i, ..., 0] = dT.resize(img, (size, size))[0]
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ngf", type=int, default=48)
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--train_batch", type=int, default=32,
                   help="DSM batch (use 8 at 256^2 ngf128: 16 score rows, "
                        "the measured-throughput geometry)")
    p.add_argument("--levels", type=int, default=232)
    p.add_argument("--n_steps_each", type=int, default=5)
    p.add_argument("--step_lr", type=float, default=6.2e-6)
    p.add_argument("--lr_scaled", type=float, default=30000.0)
    p.add_argument("--ald_lr_scaled_grid", type=float, nargs="+",
                   default=[3000.0, 10000.0, 30000.0, 100000.0],
                   help="data-consistency weights tried on the val slice "
                        "(one chain chunk each); pass a single value to "
                        "skip tuning")
    p.add_argument("--chains", type=int, default=105,
                   help="ALD ensemble size (README.md:12: 'mean of 105')")
    p.add_argument("--chain_chunk", type=int, default=35,
                   help="chains per device batch (chunks the ensemble)")
    p.add_argument("--R", type=int, default=40)
    p.add_argument("--center_frac", type=float, default=1 / 16)
    p.add_argument("--num_sens", type=int, default=4)
    p.add_argument("--map_iters", type=int, default=400)
    p.add_argument("--map_lr", type=float, default=5e-3)
    p.add_argument("--map_lamdas", type=float, nargs="+",
                   default=[0.01, 0.03, 0.1, 0.3])
    p.add_argument("--tv_regs", type=float, nargs="+",
                   default=[0.0003, 0.001, 0.003, 0.01])
    p.add_argument("--retrain", action="store_true")
    p.add_argument("--prior_path", default=None,
                   help="explicit score-net msgpack to load (e.g. a "
                        "train_acdc_prior.py snapshot, or raw_*.msgpack "
                        "for the EMA-vs-raw stability comparison); "
                        "default: <out>/prior.msgpack")
    p.add_argument("--ald_anneal_start", type=float, default=1.0,
                   help="annealed data-consistency schedule: multiplier "
                        "on lr_scaled at the TOP of the ladder, ramping "
                        "geometrically to 1x at the bottom (low early / "
                        "high late). 1.0 = constant weight (reference "
                        "semantics). Stability mitigation probe, "
                        "VERDICT r2 task 2")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--only", default=None,
                   help="comma subset of {ZF,ALD,MAP,TV} to run "
                        "(e.g. --only ALD for a recon-only regrid with a "
                        "saved prior); default all")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/acdc_sense")
    args = p.parse_args(argv)
    if args.quick:
        args.size, args.ngf, args.n_train = 32, 16, 32
        args.steps, args.levels = 60, 16
        args.chains, args.chain_chunk = 4, 2
        args.map_iters = 30
        args.map_lamdas, args.tv_regs = [0.3], [0.03]
        args.ald_lr_scaled_grid = [args.lr_scaled]
    os.makedirs(args.out, exist_ok=True)
    S = args.size

    # ---- data + prior --------------------------------------------------
    data = make_dataset(args.n_train, S, args.seed)
    sigma_max = max_pairwise_distance(data, max_samples=256)
    sigmas = sigma_ladder(sigma_max, 0.01, args.levels)
    ratio = check_ladder_stability(sigmas, args.n_steps_each, args.step_lr)
    log(f"{data.shape} slices; sigma_max {sigma_max:.1f}; "
        f"ladder stability {ratio:.1f}")

    config = Config({"data": {"channels": 1, "image_size": S,
                              "logit_transform": False, "rescaled": False},
                     "model": {"ngf": args.ngf, "nonlinearity": "elu",
                               "normalization": "InstanceNorm++"}})
    # size-dispatched arch, as the reference does (models/registry
    # get_network: <96 px -> NCSNv2, <=128 -> Deeper, <=256 -> Deepest) —
    # the 256^2 reference-geometry run uses NCSNv2Deepest like the
    # reference's ACDC recipe (ncsn/configs/acdc.yml: ngf 128, 256^2)
    from inverseproblemwithdiffusionmodel_tpu.models.registry import (
        get_network)
    module = get_network(config)
    log(f"arch: {type(module).__name__} (size {S})")
    prior_path = args.prior_path or os.path.join(args.out, "prior.msgpack")
    if args.prior_path and not os.path.exists(args.prior_path):
        raise SystemExit(f"--prior_path {args.prior_path} does not exist")
    from flax import serialization
    if not args.retrain and os.path.exists(prior_path):
        log(f"loading saved prior ({prior_path})")
        x0 = jnp.zeros((args.train_batch, S, S, 1))
        params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                      jnp.ones((args.train_batch,)))["params"]
        try:
            params = serialization.from_bytes(params,
                                              open(prior_path, "rb").read())
        except Exception as e:
            # size-dispatched get_network means a prior.msgpack saved under
            # an older arch choice no longer matches the param structure
            raise SystemExit(
                f"failed to load {prior_path} into the size-dispatched arch "
                f"{type(module).__name__} (size {S}): {e}\n"
                "If this prior was trained with a different architecture, "
                "pass --retrain (or point --out at a fresh run dir).")
        # device_put ONCE: from_bytes leaves are host numpy, and numpy jit
        # arguments re-upload per call — the host-stepped 2311-level loop
        # would queue ~900 GB of async transfers (observed 130 GB RSS OOM)
        params = jax.device_put(params)
    else:
        params = train_score_net(module, data, sigmas, args.train_batch,
                                 args.steps, args.seed, "prior",
                                 ckpt_path=prior_path + ".ckpt",
                                 retrain=args.retrain)
        tmp = prior_path + ".tmp"
        open(tmp, "wb").write(
            serialization.to_bytes(jax.device_get(params)))
        os.replace(tmp, prior_path)
        for pth in (prior_path + ".ckpt", prior_path + ".ckpt.fp"):
            if os.path.exists(pth):
                os.remove(pth)
    fwd = module if (args.f32 or jax.default_backend() == "cpu") \
        else BF16Wrap(module)

    # ---- R=40 4-coil SENSE measurement ---------------------------------
    # held-out slices: [0] = test (reported), [1] = val (hyperparam tuning)
    test = make_dataset(2, S, args.seed + 777)
    mask = random_cartesian_mask(S, args.R, args.center_frac,
                                 seed=args.seed).reshape(1, 1, S, 1)
    log(f"mask keeps {int(mask.sum())}/{S} lines (R={args.R}, "
        f"center {args.center_frac:.3f})")
    maps = np.stack([_exp_sens_map(S, S, args.seed + i)
                     for i in range(args.num_sens)])
    maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))

    def make_op(B):
        return PairSENSE(
            mask=jnp.asarray(np.tile(mask, (B, 1, 1, 1)), jnp.float32),
            sens_re=jnp.asarray(maps[..., None], jnp.float32),
            sens_im=jnp.zeros((args.num_sens, S, S, 1), jnp.float32))

    patch = jax.random.normal(jax.random.PRNGKey(args.seed + 3),
                              (2, 5, 5, 1))
    phase = resize_align_corners(patch, (S, S), axes=(1, 2))
    results, mags = {}, {}
    only = (None if args.only is None
            else {v.strip() for v in args.only.split(",")})

    def _want(name):
        return only is None or name in only
    for role, idx in (("test", 0), ("val", 1)):
        truth = jnp.asarray(test[idx:idx + 1])          # (1, S, S, 1)
        xr_t = truth * jnp.cos(phase[idx:idx + 1])
        xi_t = truth * jnp.sin(phase[idx:idx + 1])
        op1 = make_op(1)
        yr, yi = op1(xr_t, xi_t)                        # (4, 1, S, S, 1)
        results[role] = dict(truth=truth, yr=yr, yi=yi, op1=op1)

    def eval_mag(mag, role):
        t = results[role]["truth"][0]
        return (float(nrmse(mag, t)),
                float(ssim(mag[..., 0], t[..., 0])))

    out_rows = {}

    # ZF (always computed: cheap, and the comparison anchor)
    r = results["test"]
    zr, zi = r["op1"].conj_op(r["yr"], r["yi"])
    zf_mag = jnp.sqrt(zr ** 2 + zi ** 2)[0]
    out_rows["ZF"] = eval_mag(zf_mag, "test")
    mags["ZF"] = np.asarray(zf_mag)
    mags["original"] = np.asarray(results["test"]["truth"][0])
    log(f"ZF: NRMSE {out_rows['ZF'][0]:.4f} SSIM {out_rows['ZF'][1]:.4f}")

    # ALD ensemble, chunked over chains (the ensemble axis is the mesh/DP
    # axis in production; on one chip we chunk the batch)
    if _want("ALD"):
        cfg = ALDConfig(n_steps_each=args.n_steps_each,
                        step_lr=args.step_lr)
        B = args.chain_chunk
        opB = make_op(B)

        def make_recon(lr_scaled):
            if args.ald_anneal_start != 1.0:
                # geometric ramp start_mult*w -> w over the ladder; each
                # level still gets a traced scalar (no recompiles)
                lr_scaled = np.geomspace(args.ald_anneal_start * lr_scaled,
                                         lr_scaled, args.levels)
            return make_stepped_pair_reconstructor(
                fwd, sigmas, opB,
                PairL2Penalty.with_normal_kernel(opB, num_iters=6), cfg,
                lr_scaled=lr_scaled)

        # data-consistency weight tuned on the val slice with one chain
        # chunk (MAP/TV below get val tuning; tuned-best runs are what the
        # reference table reports)
        if len(args.ald_lr_scaled_grid) > 1:
            v = results["val"]
            yrV = jnp.tile(v["yr"], (1, B, 1, 1, 1))
            yiV = jnp.tile(v["yi"], (1, B, 1, 1, 1))
            best = None
            for lrs in args.ald_lr_scaled_grid:
                xrv, xiv = make_recon(lrs)(
                    params, yrV, yiV, jax.random.PRNGKey(args.seed + 50))
                n, s = eval_mag(jnp.sqrt(xrv ** 2 + xiv ** 2).mean(axis=0),
                                "val")
                log(f"val ALD lr_scaled={lrs:g}: NRMSE {n:.4f} "
                    f"SSIM {s:.4f}")
                if best is None or n < best[0]:
                    best = (n, lrs)
            args.lr_scaled = best[1]
            log(f"ALD lr_scaled tuned to {args.lr_scaled:g}")

        recon = make_recon(args.lr_scaled)
        n_chunks = (args.chains + B - 1) // B
        yrB = jnp.tile(r["yr"], (1, B, 1, 1, 1))
        yiB = jnp.tile(r["yi"], (1, B, 1, 1, 1))
        t0 = time.time()
        acc_re, acc_im = [], []
        for c in range(n_chunks):
            xr, xi = recon(params, yrB, yiB,
                           jax.random.PRNGKey(args.seed + 100 + c))
            acc_re.append(np.asarray(xr))
            acc_im.append(np.asarray(xi))
        xr = np.concatenate(acc_re)[: args.chains]
        xi = np.concatenate(acc_im)[: args.chains]
        wall = time.time() - t0
        ens_mag = jnp.asarray(np.sqrt(xr ** 2 + xi ** 2).mean(axis=0))
        out_rows["ALD"] = eval_mag(ens_mag, "test")
        mags["ALD"] = np.asarray(ens_mag)
        mags["ALD_std"] = np.sqrt(xr ** 2 + xi ** 2).std(axis=0)
        log(f"ALD x{args.chains}: NRMSE {out_rows['ALD'][0]:.4f} "
            f"SSIM {out_rows['ALD'][1]:.4f} ({wall:.0f}s)")

    # MAP (prior weight tuned on val)
    map_cfg = MAPConfig(n_iters=args.map_iters, lr=args.map_lr)

    if S >= 128:
        # host-stepped MAP: one jitted Adam iteration looped on the host —
        # the whole-run scan program at 256^2 ngf128 is the size class the
        # axon remote-compile service rejects (CLAUDE.md)
        from inverseproblemwithdiffusionmodel_tpu.samplers.map_pair import (
            make_stepped_map_pair_optimizer)
        _map_run = make_stepped_map_pair_optimizer(fwd, sigmas, op1,
                                                   config=map_cfg)

        def f_map(ps, yr, yi, lamda):
            return _map_run(ps, yr, yi, lamda)
    else:
        @jax.jit
        def f_map(ps, yr, yi, lamda):
            def score_fn(x, labels):
                return fwd.apply({"params": ps}, x, sigmas[labels])
            return map_optimizer_pair(score_fn, (yr, yi), op1, lamda,
                                      config=map_cfg)

    best = None
    for lam in (args.map_lamdas if _want("MAP") else []):
        v = results["val"]
        xr1, xi1 = f_map(params, v["yr"], v["yi"], lam)
        n, s = eval_mag(jnp.sqrt(xr1 ** 2 + xi1 ** 2)[0], "val")
        log(f"val MAP lamda={lam}: NRMSE {n:.4f} SSIM {s:.4f}")
        if best is None or n < best[0]:
            best = (n, lam)
    if _want("MAP"):
        lam = best[1]
        xr1, xi1 = f_map(params, r["yr"], r["yi"], lam)
        map_mag = jnp.sqrt(xr1 ** 2 + xi1 ** 2)[0]
        out_rows["MAP"] = eval_mag(map_mag, "test")
        mags["MAP"] = np.asarray(map_mag)
        log(f"MAP (lamda={lam}): NRMSE {out_rows['MAP'][0]:.4f} "
            f"SSIM {out_rows['MAP'][1]:.4f}")

    # TV (reg weight tuned on val)
    @jax.jit
    def f_tv(yr, yi, reg):
        return tv_reconstruction_pair((yr, yi), op1, reg_weight=reg,
                                      config=map_cfg)

    best = None
    for reg in (args.tv_regs if _want("TV") else []):
        v = results["val"]
        xr1, xi1 = f_tv(v["yr"], v["yi"], reg)
        n, s = eval_mag(jnp.sqrt(xr1 ** 2 + xi1 ** 2)[0], "val")
        log(f"val TV reg={reg}: NRMSE {n:.4f} SSIM {s:.4f}")
        if best is None or n < best[0]:
            best = (n, reg)
    if _want("TV"):
        reg = best[1]
        xr1, xi1 = f_tv(r["yr"], r["yi"], reg)
        tv_mag = jnp.sqrt(xr1 ** 2 + xi1 ** 2)[0]
        out_rows["TV"] = eval_mag(tv_mag, "test")
        mags["TV"] = np.asarray(tv_mag)
        log(f"TV (reg={reg}): NRMSE {out_rows['TV'][0]:.4f} "
            f"SSIM {out_rows['TV'][1]:.4f}")

    # ---- artifacts ------------------------------------------------------
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    names = [n for n in ("original", "ZF", "ALD", "MAP", "TV")
             if n in mags]
    extra = 1 if "ALD_std" in mags else 0
    fig, axes = plt.subplots(1, len(names) + extra,
                             figsize=(3 * 6, 3.2), squeeze=False)
    axes = axes[0]
    for ax, name in zip(axes, names):
        ax.imshow(np.squeeze(mags[name]), cmap="gray")
        title = name if name == "original" else (
            f"{name}\nNRMSE {out_rows[name][0]:.3f} / "
            f"SSIM {out_rows[name][1]:.3f}")
        ax.set_title(title, fontsize=9)
        ax.set_axis_off()
    if extra:   # only when ALD ran (--only subsets without it have no std)
        axes[-1].imshow(np.squeeze(mags["ALD_std"]), cmap="viridis")
        axes[-1].set_title(f"ALD std ({args.chains} chains)", fontsize=9)
        axes[-1].set_axis_off()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "comparison.png"), dpi=130)
    plt.close(fig)

    rows = {k: {"nrmse": round(v[0], 4), "ssim": round(v[1], 4)}
            for k, v in out_rows.items()}
    with open(os.path.join(args.out, "metrics.txt"), "w") as f:
        for k, v in rows.items():
            f.write(f"{k}: NRMSE {v['nrmse']}, SSIM {v['ssim']}\n")
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump({"args": vars(args), "results": rows}, f, indent=2)
    log(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
