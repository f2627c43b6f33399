"""Segmentation-guided ALD ablation: the reference's headline single-coil
ACDC mechanism (scripts/acdc_inv_seg_sampling_keep_center_prox_real_imag.py)
measured end-to-end — does myocardium-segmentation guidance improve the
reconstruction?

Trains (or reloads) an NCSNv2 score prior and a small seg UNet on synthetic
short-axis cardiac phantoms (blood pool + myocardium ring, labels in the
ACDC convention), then reconstructs an R-fold undersampled single-coil
measurement (variable-density Cartesian mask with guaranteed center lines)
with the pair-form ALD sampler:

  ZF | ALD (no guidance) | ALD + seg guidance (seg_lamda tuned on a val
  slice, linear lh ramp from --seg_start_time)

All ALD runs share the data-consistency weight (tuned on val with guidance
off) so the guidance effect is isolated. Reports NRMSE/SSIM averaged over
`--n_test` held-out test slices (paired PRNG keys per slice) plus the Dice
overlap between seg(recon) and the true mask; the full val tuning curves
land in results.json.

  python examples/acdc_seg_guidance.py [--quick] [--out runs/acdc_seg]
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
from inverseproblemwithdiffusionmodel_tpu.models.unet import UNet
from inverseproblemwithdiffusionmodel_tpu.operators import (
    RandomUndersamplingFourier)
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairRandomUndersamplingFourier, PairL2Penalty)
from inverseproblemwithdiffusionmodel_tpu.samplers import ALDConfig
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    make_stepped_pair_reconstructor)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
    sigma_ladder, check_ladder_stability)
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_seg_train_step)
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)
from inverseproblemwithdiffusionmodel_tpu.utils.metrics import nrmse, ssim


def log(msg):
    print(f"[seg] {msg}", flush=True)


def make_dataset(n: int, size: int, seed: int):
    """Synthetic cardiac slices + binary myocardium masks, both at size^2."""
    rng = np.random.RandomState(seed)
    imgs = np.empty((n, size, size, 1), np.float32)
    masks = np.empty((n, size, size), np.int32)
    for i in range(n):
        img, label = synthetic_acdc_slice(rng)
        img = dT.scale_intensity(img)
        imgs[i, ..., 0] = dT.resize(img, (size, size))[0]
        masks[i] = dT.resize((label == 3).astype(np.float32), (size, size),
                             mode="nearest")[0].astype(np.int32)
    return imgs, masks


def dice(pred: np.ndarray, ref: np.ndarray) -> float:
    inter = float((pred * ref).sum())
    return 2.0 * inter / max(float(pred.sum() + ref.sum()), 1.0)


def train_seg_net(module, imgs, masks, batch, steps, seed, ckpt_path=None,
                  perturb_sigmas=None):
    """Small DiceCE training loop (reference: helpers/pl_helpers.py:264-352);
    deterministic step-indexed batch/key streams like train_score_net."""
    from flax import serialization
    x0 = jnp.zeros((batch,) + imgs.shape[1:])
    params = jax.jit(module.init)(jax.random.PRNGKey(seed), x0)["params"]
    config = Config({"optim": {"optimizer": "Adam", "lr": 3e-4,
                               "beta1": 0.9, "eps": 1e-8,
                               "weight_decay": 0.0, "grad_clip": 1.0}})
    state = TrainState.create(params, get_optimizer(config), ema_decay=0.999)
    if ckpt_path and os.path.exists(ckpt_path):
        log("loading saved seg net")
        restored = serialization.from_bytes(
            state.params, open(ckpt_path, "rb").read())
        return restored
    # noise-matched training: perturb inputs over the (capped) recon
    # ladder so the seg gradient is informative mid-chain; default matches
    # the reference's clean-input training (seg_loss.py:20-21)
    if perturb_sigmas is not None:
        step_fn = make_seg_train_step(module, jnp.asarray(perturb_sigmas),
                                      perturb=True)
    else:
        step_fn = make_seg_train_step(module, jnp.asarray([1.0]))
    n = imgs.shape[0]
    t0 = time.time()
    for s in range(steps):
        rng = np.random.RandomState(seed * 100003 + s)
        idx = rng.randint(0, n, size=batch)
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 7), s)
        state, loss = step_fn(
            state, (jnp.asarray(imgs[idx]), jnp.asarray(masks[idx])), key)
        if s % max(steps // 10, 1) == 0 or s == steps - 1:
            log(f"seg step {s}: loss {float(loss):.4f} "
                f"({time.time() - t0:.0f}s)")
    params = jax.device_get(state.eval_params)
    if ckpt_path:
        tmp = ckpt_path + ".tmp"
        open(tmp, "wb").write(serialization.to_bytes(params))
        os.replace(tmp, ckpt_path)
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ngf", type=int, default=48)
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--seg_steps", type=int, default=1500)
    p.add_argument("--levels", type=int, default=232)
    p.add_argument("--n_steps_each", type=int, default=5)
    p.add_argument("--step_lr", type=float, default=6.2e-6)
    p.add_argument("--lr_scaled_grid", type=float, nargs="+",
                   default=[1e5, 3e5, 1e6, 3e6])
    p.add_argument("--seg_lamda_grid", type=float, nargs="+",
                   default=[3.0, 10.0, 30.0, 100.0])
    p.add_argument("--seg_start_time", type=float, default=0.0)
    p.add_argument("--seg_mode", default="full", choices=["full", "FG"],
                   help="FG masks the seg-likelihood gradient to foreground "
                        "pixels (robustness probe: keeps guidance from "
                        "pulling background toward wrong anatomy)")
    p.add_argument("--seg_perturb", action="store_true",
                   help="noise-matched seg training: perturb seg-net inputs "
                        "with ladder noise up to --seg_perturb_max_sigma "
                        "(the reference computes but DISABLES this, "
                        "ncsn/losses/seg_loss.py:20-21; enabling it makes "
                        "the seg gradient meaningful at the noise levels "
                        "where the lh ramp is active)")
    p.add_argument("--seg_perturb_max_sigma", type=float, default=1.0)
    p.add_argument("--n_test", type=int, default=3,
                   help="held-out test slices (metrics averaged)")
    p.add_argument("--chains", type=int, default=35,
                   help="ALD ensemble size per condition")
    p.add_argument("--R", type=int, default=8)
    p.add_argument("--center_frac", type=float, default=1 / 16)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/acdc_seg")
    args = p.parse_args(argv)
    if args.quick:
        args.size, args.ngf, args.n_train = 32, 16, 32
        args.steps, args.seg_steps, args.levels = 60, 40, 16
        args.chains = 4
        args.n_test = 1
        args.lr_scaled_grid = [3e4]
        args.seg_lamda_grid = [10.0]
    os.makedirs(args.out, exist_ok=True)
    S = args.size

    # ---- data + priors --------------------------------------------------
    imgs, masks = make_dataset(args.n_train, S, args.seed)
    sigma_max = max_pairwise_distance(imgs, max_samples=256)
    sigmas = sigma_ladder(sigma_max, 0.01, args.levels)
    ratio = check_ladder_stability(sigmas, args.n_steps_each, args.step_lr)
    log(f"{imgs.shape} slices; sigma_max {sigma_max:.1f}; "
        f"ladder stability {ratio:.1f}")

    config = Config({"data": {"channels": 1, "image_size": S,
                              "logit_transform": False, "rescaled": False},
                     "model": {"ngf": args.ngf, "nonlinearity": "elu",
                               "normalization": "InstanceNorm++"}})
    module = NCSNv2(config=config)
    from flax import serialization
    # shares the prior with examples/acdc_sense_ensemble.py when present
    # (same dataset seed / architecture / training recipe)
    prior_path = os.path.join(args.out, "prior.msgpack")
    alt = os.path.join(os.path.dirname(args.out), "acdc_sense",
                       "prior.msgpack")
    if not os.path.exists(prior_path) and os.path.exists(alt) \
            and not args.quick:
        prior_path = alt
    if os.path.exists(prior_path):
        log(f"loading saved prior ({prior_path})")
        x0 = jnp.zeros((32, S, S, 1))
        params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                      jnp.ones((32,)))["params"]
        loaded = serialization.from_bytes(params,
                                          open(prior_path, "rb").read())
        # from_bytes does NOT validate leaf shapes: a sibling prior
        # trained at a different size/ngf (e.g. a --quick run) would load
        # silently and corrupt the ablation - check and retrain instead
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: np.shape(a) == np.shape(b), params, loaded))
        if same:
            params = loaded
        else:
            log(f"saved prior at {prior_path} has mismatched shapes "
                "(different size/ngf); retraining")
            params = train_score_net(module, imgs, sigmas, 32, args.steps,
                                     args.seed, "prior")
    else:
        params = train_score_net(module, imgs, sigmas, 32, args.steps,
                                 args.seed, "prior",
                                 ckpt_path=prior_path + ".ckpt")
        tmp = prior_path + ".tmp"
        open(tmp, "wb").write(
            serialization.to_bytes(jax.device_get(params)))
        os.replace(tmp, prior_path)
        for pth in (prior_path + ".ckpt", prior_path + ".ckpt.fp"):
            if os.path.exists(pth):
                os.remove(pth)
    fwd = module if (args.f32 or jax.default_backend() == "cpu") \
        else BF16Wrap(module)

    seg_module = UNet(out_channels=2, features=(32, 64, 128),
                      strides=(2, 2), ndim=2)
    pert = None
    seg_ckpt = os.path.join(args.out, "seg.msgpack")
    if args.seg_perturb:
        sig_np = np.asarray(sigmas)
        pert = sig_np[sig_np <= args.seg_perturb_max_sigma]
        seg_ckpt = os.path.join(args.out, "seg_perturbed.msgpack")
    seg_params = train_seg_net(seg_module, imgs, masks, 16, args.seg_steps,
                               args.seed, ckpt_path=seg_ckpt,
                               perturb_sigmas=pert)
    seg_params_d = jax.tree_util.tree_map(jnp.asarray, seg_params)

    def seg_fn(p, x):                # weights as argument (axon-safe jit)
        return seg_module.apply({"params": p}, x)

    @jax.jit
    def _seg_predict(p, x):   # params as a jit argument (axon-safe)
        return jnp.argmax(seg_fn(p, x), axis=-1)

    def seg_predict(x):
        return _seg_predict(seg_params_d, x)

    # sanity: seg quality on clean held-out slices
    # slices [0 .. n_test-1] = test (reported, averaged); [n_test] = val
    n_held = args.n_test + 1
    test_imgs, test_masks = make_dataset(n_held, S, args.seed + 777)
    clean_dice = dice(np.asarray(seg_predict(jnp.asarray(test_imgs))),
                      test_masks)
    log(f"seg net Dice on clean held-out slices: {clean_dice:.4f}")

    # ---- measurement (single-coil, keep-center variable-density) --------
    # held-out slices: [0] = test (reported), [1] = val (tuning)
    op_c = RandomUndersamplingFourier.create(
        args.R, args.center_frac, (S, S, 1), seed=args.seed, num_frames=1)
    pair_op = PairRandomUndersamplingFourier.from_complex(op_c)
    log(f"mask keeps {int(np.asarray(op_c.mask).sum())}/{S} lines "
        f"(R={args.R})")

    from inverseproblemwithdiffusionmodel_tpu.ops.resize import (
        resize_align_corners)
    patch = jax.random.normal(jax.random.PRNGKey(args.seed + 3),
                              (n_held, 5, 5, 1))
    phase = resize_align_corners(patch, (S, S), axes=(1, 2))
    slices = []                      # [0..n_test-1]=test, [n_test]=val
    for idx in range(n_held):
        truth = jnp.asarray(test_imgs[idx:idx + 1])
        xr_t = truth * jnp.cos(phase[idx:idx + 1])
        xi_t = truth * jnp.sin(phase[idx:idx + 1])
        yr, yi = pair_op(xr_t, xi_t)
        slices.append(dict(truth=truth, yr=yr, yi=yi,
                           label=jnp.asarray(test_masks[idx:idx + 1])))
    val_idx = args.n_test

    def eval_mag(mag, idx):
        t = slices[idx]["truth"][0]
        d = dice(np.asarray(seg_predict(mag[None])[0]),
                 np.asarray(slices[idx]["label"][0]))
        return (float(nrmse(mag, t)), float(ssim(mag[..., 0], t[..., 0])), d)

    out_rows, mags = {}, {}
    zf_rows = []
    for idx in range(args.n_test):
        r = slices[idx]
        zr, zi = pair_op.conj_op(r["yr"], r["yi"])
        zf_mag = jnp.sqrt(zr ** 2 + zi ** 2)[0]
        zf_rows.append(eval_mag(zf_mag, idx))
        if idx == 0:
            mags["ZF"], mags["original"] = np.asarray(zf_mag), test_imgs[0]
    out_rows["ZF"] = tuple(np.mean(zf_rows, axis=0))
    log(f"ZF (mean of {args.n_test} test slices): "
        f"NRMSE {out_rows['ZF'][0]:.4f} SSIM {out_rows['ZF'][1]:.4f} "
        f"Dice {out_rows['ZF'][2]:.4f}")

    # ---- ALD conditions -------------------------------------------------
    cfg = ALDConfig(n_steps_each=args.n_steps_each, step_lr=args.step_lr)
    B = args.chains
    prox = PairL2Penalty.with_normal_kernel(pair_op, num_iters=6)

    def run(idx, lr_scaled, seg_lamda=None, key_off=0):
        """One chain-chunk ensemble; returns (mean_mag, (nrmse, ssim, dice))."""
        kw = {}
        if seg_lamda is not None:
            kw = dict(seg_fn=seg_fn, seg_params=seg_params_d,
                      seg_label=jnp.tile(slices[idx]["label"], (B, 1, 1)),
                      seg_lamda=seg_lamda,
                      seg_start_time=args.seg_start_time,
                      seg_mode=args.seg_mode)
        recon = make_stepped_pair_reconstructor(
            fwd, sigmas, pair_op, prox, cfg, lr_scaled=lr_scaled, **kw)
        yrB = jnp.tile(slices[idx]["yr"], (B, 1, 1, 1))
        yiB = jnp.tile(slices[idx]["yi"], (B, 1, 1, 1))
        xr, xi = recon(params, yrB, yiB,
                       jax.random.PRNGKey(args.seed + 100 + key_off))
        mag = jnp.sqrt(xr ** 2 + xi ** 2).mean(axis=0)
        return mag, eval_mag(mag, idx)

    tuning = {"lr_scaled": [], "seg_lamda": []}

    # 1) data-consistency weight tuned on val, guidance OFF
    best = None
    for i, lrs in enumerate(args.lr_scaled_grid):
        t0 = time.time()
        _, (n, s, d) = run(val_idx, lrs, key_off=i)
        log(f"val ALD lr_scaled={lrs:g}: NRMSE {n:.4f} SSIM {s:.4f} "
            f"Dice {d:.4f} ({time.time() - t0:.0f}s)")
        tuning["lr_scaled"].append(
            {"lr_scaled": lrs, "nrmse": round(n, 4), "ssim": round(s, 4),
             "dice": round(d, 4)})
        if best is None or n < best[0]:
            best = (n, lrs)
    lr_scaled = best[1]
    log(f"lr_scaled tuned to {lr_scaled:g}")

    # 2) seg_lamda tuned on val, guidance ON (same lr_scaled)
    best = None
    for i, lam in enumerate(args.seg_lamda_grid):
        t0 = time.time()
        _, (n, s, d) = run(val_idx, lr_scaled, seg_lamda=lam, key_off=50 + i)
        log(f"val ALD+seg lamda={lam:g}: NRMSE {n:.4f} SSIM {s:.4f} "
            f"Dice {d:.4f} ({time.time() - t0:.0f}s)")
        tuning["seg_lamda"].append(
            {"seg_lamda": lam, "nrmse": round(n, 4), "ssim": round(s, 4),
             "dice": round(d, 4)})
        if best is None or n < best[0]:
            best = (n, lam)
    seg_lamda = best[1]
    log(f"seg_lamda tuned to {seg_lamda:g}")

    # 3) test runs, averaged over slices (same key per slice for both
    #    conditions: paired comparison)
    per_slice = {"ALD": [], "ALD+seg": []}
    for idx in range(args.n_test):
        mag, row = run(idx, lr_scaled, key_off=1000 + idx)
        per_slice["ALD"].append(row)
        if idx == 0:
            mags["ALD"] = np.asarray(mag)
        log(f"test[{idx}] ALD:     NRMSE {row[0]:.4f} SSIM {row[1]:.4f} "
            f"Dice {row[2]:.4f}")
        mag, row = run(idx, lr_scaled, seg_lamda=seg_lamda,
                       key_off=1000 + idx)
        per_slice["ALD+seg"].append(row)
        if idx == 0:
            mags["ALD+seg"] = np.asarray(mag)
        log(f"test[{idx}] ALD+seg: NRMSE {row[0]:.4f} SSIM {row[1]:.4f} "
            f"Dice {row[2]:.4f}")
    for name in ("ALD", "ALD+seg"):
        out_rows[name] = tuple(np.mean(per_slice[name], axis=0))
        log(f"test mean {name}: NRMSE {out_rows[name][0]:.4f} "
            f"SSIM {out_rows[name][1]:.4f} Dice {out_rows[name][2]:.4f}")

    # ---- artifacts ------------------------------------------------------
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    names = ["original", "ZF", "ALD", "ALD+seg"]
    fig, axes = plt.subplots(1, len(names), figsize=(3 * len(names), 3.2))
    fig_rows = dict(out_rows)        # figure shows slice 0 -> its metrics
    fig_rows["ZF"] = zf_rows[0]
    for name in ("ALD", "ALD+seg"):
        fig_rows[name] = per_slice[name][0]
    for ax, name in zip(axes, names):
        ax.imshow(np.squeeze(mags[name]), cmap="gray")
        title = name if name == "original" else (
            f"{name}\nNRMSE {fig_rows[name][0]:.3f} / "
            f"SSIM {fig_rows[name][1]:.3f} / Dice {fig_rows[name][2]:.3f}")
        ax.set_title(title, fontsize=9)
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "comparison.png"), dpi=130)
    plt.close(fig)

    rows = {k: {"nrmse": round(v[0], 4), "ssim": round(v[1], 4),
                "dice": round(v[2], 4)} for k, v in out_rows.items()}
    payload = {"args": {k: v for k, v in vars(args).items()},
               "tuned": {"lr_scaled": lr_scaled, "seg_lamda": seg_lamda,
                         "clean_seg_dice": round(clean_dice, 4)},
               "tuning": tuning,
               "per_test_slice": {
                   k: [[round(float(x), 4) for x in row] for row in v]
                   for k, v in per_slice.items()},
               "results": rows}
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(payload, f, indent=2)
    with open(os.path.join(args.out, "metrics.txt"), "w") as f:
        for k, v in rows.items():
            f.write(f"{k}: NRMSE {v['nrmse']}, SSIM {v['ssim']}, "
                    f"Dice {v['dice']}\n")
    log(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
