"""Classifier-guided class-conditional sampling: the reference's
`anneal_Langevin_dynamics_cls_conditioned` mechanism
(ncsn/models/__init__.py:219-266) measured end-to-end.

Trains an NCSNv2 score prior and two ResNet-18 classifiers on MNIST (the
hermetic synthetic-digit fallback when the IDX files are absent): a
noise-robust GUIDE (perturbation loss, ncsn/losses/clf_loss.py) used for
the guidance gradient, and an independent clean JUDGE (different seed, no
perturbation) that scores the generated samples. For every class c we draw
`--per_class` samples with `ald_cls_conditioned` and report the fraction
the judge assigns to c, against the unconditional-sampling baseline
(~chance). Everything runs real-valued — axon/TPU-safe with no complex ops.

  python examples/mnist_clf_guidance.py [--quick] [--out runs/mnist_clf]
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

from inverseproblemwithdiffusionmodel_tpu.config import (Config,
                                                         load_general_config)
from inverseproblemwithdiffusionmodel_tpu.data.datasets import load_mnist
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.models.classifier import ResNetClf
from inverseproblemwithdiffusionmodel_tpu.samplers import (
    ALDConfig, ald_unconditional_sampler)
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_variants import (
    ald_cls_conditioned)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
    sigma_ladder, check_ladder_stability)
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_clf_train_step)
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)


def log(msg):
    print(f"[clf] {msg}", flush=True)


def train_clf(module, imgs, ys, sigmas, batch, steps, seed, tag,
              ckpt_path=None):
    """Classifier training loop; `sigmas=[0]` trains on clean inputs
    (the judge), a real ladder trains the noise-robust guide."""
    from flax import serialization
    x0 = jnp.zeros((batch,) + imgs.shape[1:])
    params = jax.jit(module.init)(jax.random.PRNGKey(seed), x0)["params"]
    config = Config({"optim": {"optimizer": "Adam", "lr": 3e-4,
                               "beta1": 0.9, "eps": 1e-8,
                               "weight_decay": 0.0, "grad_clip": 1.0}})
    state = TrainState.create(params, get_optimizer(config), ema_decay=0.999)
    if ckpt_path and os.path.exists(ckpt_path):
        log(f"loading saved {tag}")
        return serialization.from_bytes(state.params,
                                        open(ckpt_path, "rb").read())
    step_fn = make_clf_train_step(module, jnp.asarray(sigmas))
    n = imgs.shape[0]
    t0 = time.time()
    for s in range(steps):
        rng = np.random.RandomState(seed * 99991 + s)
        idx = rng.randint(0, n, size=batch)
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 13), s)
        state, loss = step_fn(
            state, (jnp.asarray(imgs[idx]), jnp.asarray(ys[idx])), key)
        if s % max(steps // 8, 1) == 0 or s == steps - 1:
            log(f"{tag} step {s}: loss {float(loss):.4f} "
                f"({time.time() - t0:.0f}s)")
    params = jax.device_get(state.eval_params)
    if ckpt_path:
        tmp = ckpt_path + ".tmp"
        open(tmp, "wb").write(serialization.to_bytes(params))
        os.replace(tmp, ckpt_path)
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--ngf", type=int, default=32)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--clf_steps", type=int, default=1200)
    p.add_argument("--levels", type=int, default=232)
    p.add_argument("--n_steps_each", type=int, default=5)
    p.add_argument("--step_lr", type=float, default=6.2e-6)
    p.add_argument("--per_class", type=int, default=16)
    p.add_argument("--clf_temp", type=float, default=1.0,
                   help="guidance strength: clf logits are scaled by this "
                        "before the log-softmax gradient")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/mnist_clf")
    args = p.parse_args(argv)
    if args.quick:
        args.ngf, args.steps, args.clf_steps = 16, 60, 30
        args.levels, args.per_class = 16, 4
    os.makedirs(args.out, exist_ok=True)
    S = args.size

    # ---- data -----------------------------------------------------------
    train = load_mnist(mode="train", size=S)
    imgs = np.asarray(train.data, np.float32)
    ys = np.asarray(train.labels, np.int64)
    log(f"{imgs.shape} digits")
    sigma_max = max_pairwise_distance(imgs, max_samples=256)
    sigmas = sigma_ladder(sigma_max, 0.01, args.levels)
    ratio = check_ladder_stability(sigmas, args.n_steps_each, args.step_lr)
    log(f"sigma_max {sigma_max:.1f}; ladder stability {ratio:.1f}")

    # ---- score prior ----------------------------------------------------
    config = Config({"data": {"channels": 1, "image_size": S,
                              "logit_transform": False, "rescaled": False},
                     "model": {"ngf": args.ngf, "nonlinearity": "elu",
                               "normalization": "InstanceNorm++"}})
    module = NCSNv2(config=config)
    from flax import serialization
    prior_path = os.path.join(args.out, "prior.msgpack")
    if os.path.exists(prior_path):
        log("loading saved prior")
        x0 = jnp.zeros((32, S, S, 1))
        params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                      jnp.ones((32,)))["params"]
        params = serialization.from_bytes(params,
                                          open(prior_path, "rb").read())
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

    # ---- classifiers: noise-robust guide + clean judge ------------------
    gc = load_general_config()
    clf_module = ResNetClf(config=gc)
    guide_params = train_clf(clf_module, imgs, ys, sigmas, 64,
                             args.clf_steps, args.seed, "guide clf",
                             os.path.join(args.out, "guide.msgpack"))
    judge_params = train_clf(clf_module, imgs, ys, [0.0], 64,
                             args.clf_steps, args.seed + 1, "judge clf",
                             os.path.join(args.out, "judge.msgpack"))
    guide_d = jax.tree_util.tree_map(jnp.asarray, guide_params)
    judge_d = jax.tree_util.tree_map(jnp.asarray, judge_params)

    test = load_mnist(mode="test", size=S)

    @jax.jit
    def _judge_predict(p, x):
        # params as a jit ARGUMENT (closed-over pytrees inline as HLO
        # constants -> slow lowering / oversized remote compiles, CLAUDE.md)
        return jnp.argmax(clf_module.apply({"params": p}, x), axis=-1)

    def judge_predict(x):
        return _judge_predict(judge_d, x)

    judge_acc = float(np.mean(np.asarray(
        judge_predict(jnp.asarray(test.data))) == np.asarray(test.labels)))
    log(f"judge accuracy on held-out digits: {judge_acc:.4f}")

    # ---- sampling -------------------------------------------------------
    cfg = ALDConfig(n_steps_each=args.n_steps_each, step_lr=args.step_lr)
    B = args.per_class
    temp = args.clf_temp

    @jax.jit
    def sample_cond(params, clf_params, cls, key):
        def score_fn(x, labels):
            return fwd.apply({"params": params}, x, sigmas[labels])

        def clf_fn(x):
            return temp * clf_module.apply({"params": clf_params}, x)

        return ald_cls_conditioned(score_fn, clf_fn, cls, sigmas,
                                   (B, S, S, 1), key, cfg)

    @jax.jit
    def sample_uncond(params, key):
        def score_fn(x, labels):
            return fwd.apply({"params": params}, x, sigmas[labels])

        return ald_unconditional_sampler(score_fn, sigmas, (B, S, S, 1),
                                         key, cfg)

    t0 = time.time()
    xu = sample_uncond(params, jax.random.PRNGKey(args.seed + 500))
    pred_u = np.asarray(judge_predict(xu))
    log(f"unconditional: judge histogram {np.bincount(pred_u, minlength=10)}"
        f" ({time.time() - t0:.0f}s)")

    per_class_acc, grids = {}, {}
    for c in range(10):
        t0 = time.time()
        cls = jnp.full((B,), c, jnp.int32)
        x = sample_cond(params, guide_d, cls,
                        jax.random.PRNGKey(args.seed + 1000 + c))
        pred = np.asarray(judge_predict(x))
        acc = float(np.mean(pred == c))
        per_class_acc[c] = acc
        grids[c] = np.asarray(x)
        log(f"class {c}: judge-agreement {acc:.3f} "
            f"(pred histogram {np.bincount(pred, minlength=10)}) "
            f"({time.time() - t0:.0f}s)")

    cond_acc = float(np.mean(list(per_class_acc.values())))
    # reference level: an unguided sampler can agree with a REQUESTED class
    # at most as often as its most frequent predicted class appears
    # (the naive mean-over-classes agreement is identically 0.1 for any
    # prediction vector and carries no information)
    uncond_hist = np.bincount(pred_u, minlength=10) / max(len(pred_u), 1)
    uncond_acc = float(uncond_hist.max())
    log(f"mean class-agreement: conditional {cond_acc:.3f} vs "
        f"unconditional best-single-class {uncond_acc:.3f} "
        f"(uncond histogram {np.round(uncond_hist, 2)})")

    # ---- artifacts ------------------------------------------------------
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ncol = min(B, 8)
    fig, axes = plt.subplots(10, ncol, figsize=(1.2 * ncol, 12))
    for c in range(10):
        for j in range(ncol):
            ax = axes[c][j] if ncol > 1 else axes[c]
            ax.imshow(grids[c][j, ..., 0], cmap="gray")
            ax.set_axis_off()
            if j == 0:
                ax.set_title(f"cls {c} ({per_class_acc[c]:.2f})",
                             fontsize=8, loc="left")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "class_grid.png"), dpi=120)
    plt.close(fig)

    payload = {"args": vars(args),
               "judge_test_accuracy": round(judge_acc, 4),
               "per_class_agreement": {str(k): round(v, 4)
                                       for k, v in per_class_acc.items()},
               "mean_conditional_agreement": round(cond_acc, 4),
               "unconditional_best_single_class": round(uncond_acc, 4)}
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(payload, f, indent=2)
    log(json.dumps({"conditional": round(cond_acc, 4),
                    "unconditional": round(uncond_acc, 4),
                    "judge": round(judge_acc, 4)}))
    return payload


if __name__ == "__main__":
    main()
