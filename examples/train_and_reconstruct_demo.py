"""End-to-end demo: train an NCSNv2 score prior on synthetic cardiac
phantoms, then solve an R=8 undersampled-MRI inverse problem with it.

This is the full product loop of the reference (train_ncsn.py ->
acdc_inv_seg_sampling_keep_center_prox_real_imag.py) on data generated
in-process, runnable on one TPU chip or CPU:

  python examples/train_and_reconstruct_demo.py \\
      [--steps 1500] [--size 64] [--ngf 32] [--chains 8] [--out runs/demo]

Prints train losses, then ZF vs ensemble-mean NRMSE/SSIM, and writes the
sample-grid figure + metrics.txt via utils.visualizations. Uses the
real-pair reconstruction pipeline (TPU-safe, no complex dtypes) and the
native C++ prefetch batcher when available.
"""
from __future__ import annotations

import argparse
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

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.data.datasets import (
    synthetic_acdc_slice)
from inverseproblemwithdiffusionmodel_tpu.data import transforms as dT
from inverseproblemwithdiffusionmodel_tpu.models import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.operators.masks import (
    random_cartesian_mask)
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairRandomUndersamplingFourier, PairL2Penalty)
from inverseproblemwithdiffusionmodel_tpu.samplers import ALDConfig
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    make_stepped_pair_reconstructor)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_score_train_step)
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)
from inverseproblemwithdiffusionmodel_tpu.utils.metrics import nrmse, ssim


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
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ngf", type=int, default=32)
    p.add_argument("--batch", type=int, default=32)
    # levels: per-level contraction demand ln(sig_max/sig_end)/L must stay
    # under the Langevin drift rate n_steps*step_lr/sig_end^2 (~2.7%/level
    # at the reference step_lr) or the chain cannot anneal down
    p.add_argument("--levels", type=int, default=232)
    p.add_argument("--chains", type=int, default=8)
    p.add_argument("--R", type=int, default=8)
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--lr_scaled", type=float, default=30000.0)
    p.add_argument("--out", default="runs/demo")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    # ---- data ---------------------------------------------------------
    data = make_dataset(args.n_train, args.size, args.seed)
    sigma_max = max_pairwise_distance(data, max_samples=256)
    sigmas = sigma_ladder(sigma_max, 0.01, args.levels)
    print(f"[demo] {data.shape} phantoms; sigma_max={sigma_max:.1f}",
          flush=True)

    config = Config({
        "data": {"channels": 1, "image_size": args.size,
                 "logit_transform": False, "rescaled": False},
        "model": {"ngf": args.ngf, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++"},
        "optim": {"optimizer": "Adam", "lr": 1e-4, "beta1": 0.9,
                  "eps": 1e-8, "weight_decay": 0.0, "grad_clip": 1.0},
    })
    module = NCSNv2(config=config)
    x0 = jnp.zeros((args.batch, args.size, args.size, 1))
    params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                  jnp.ones((args.batch,)))["params"]
    state = TrainState.create(params, get_optimizer(config), ema_decay=0.999)
    step = make_score_train_step(module, sigmas, data_mode="real-imag")

    # ---- train --------------------------------------------------------
    try:
        from inverseproblemwithdiffusionmodel_tpu.data.native_loader import (
            NativeBatchIterator, native_available)
        use_native = native_available()
    except Exception:
        use_native = False
    if use_native:
        it = NativeBatchIterator(data, args.batch, seed=args.seed)
        next_batch = it.next
    else:
        rng = np.random.RandomState(args.seed)
        next_batch = lambda: data[rng.choice(len(data), args.batch)]

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, loss = step(state, jnp.asarray(next_batch()), k)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            print(f"[demo] step {i}: loss {float(loss):.1f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)

    # ---- reconstruct a held-out phantom --------------------------------
    test = make_dataset(4, args.size, args.seed + 777)
    truth = jnp.asarray(test[:1])                      # (1, S, S, 1)
    mask = random_cartesian_mask(args.size, args.R, 1 / 16,
                                 seed=args.seed).reshape(1, 1, -1, 1)
    op = PairRandomUndersamplingFourier(mask=jnp.asarray(mask, jnp.float32))
    # random smooth phase, pair form
    from inverseproblemwithdiffusionmodel_tpu.ops.resize import (
        resize_align_corners)
    patch = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 5, 1))
    phase = resize_align_corners(patch, (args.size, args.size), axes=(1, 2))
    xr_true = truth * jnp.cos(phase)
    xi_true = truth * jnp.sin(phase)
    yr, yi = op(xr_true, xi_true)
    zr, zi = op.conj_op(yr, yi)
    zf_mag = jnp.sqrt(zr ** 2 + zi ** 2)

    yr_b = jnp.tile(yr, (args.chains, 1, 1, 1))
    yi_b = jnp.tile(yi, (args.chains, 1, 1, 1))
    ema_params = state.eval_params
    # stability: per-level noise-variance decay 2*ln(sig_ratio)/L must sit
    # well under the Langevin relaxation rate n_steps*2*step_lr/sig_end^2;
    # these are the reference's MNIST recon settings (mnist.yml sampling:
    # step_lr 6.2e-6, n_steps_each 5 -> 62%/level vs ~5%/level demand)
    cfg = ALDConfig(n_steps_each=5, step_lr=6.2e-6)

    # prox coefficient = step_lr * lr_scaled; our CG prox solves the
    # normal equations exactly, so a coefficient of ~1e-2 per inner step
    # gives firm data consistency (the reference's single-SGD-step prox is
    # ~1000x weaker per step and leans on its 6933-step chains instead)
    recon = make_stepped_pair_reconstructor(
        module, sigmas, op, PairL2Penalty.with_normal_kernel(op, num_iters=6), cfg,
        lr_scaled=args.lr_scaled)

    t0 = time.time()
    xr, xi = recon(ema_params, yr_b, yi_b, jax.random.PRNGKey(9))
    mean_mag = jnp.sqrt(xr ** 2 + xi ** 2).mean(axis=0)
    # sync via a device->host scalar fetch before reading the clock
    # (async dispatch would otherwise under-report; CLAUDE.md)
    _ = float(mean_mag.sum())
    wall = time.time() - t0

    # bf16 forward variant with the SAME trained weights: quality + speed
    bf16_metrics = {}
    if jax.default_backend() != "cpu":
        class _BF16Wrap:
            def apply(self, variables, x, cond):
                pbf = jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.bfloat16), variables["params"])
                out = module.apply({"params": pbf}, x.astype(jnp.bfloat16),
                                   cond.astype(jnp.bfloat16))
                return out.astype(jnp.float32)

        recon_bf = make_stepped_pair_reconstructor(
            _BF16Wrap(), sigmas, op, PairL2Penalty.with_normal_kernel(op, num_iters=6),
            cfg, lr_scaled=args.lr_scaled)
        t0 = time.time()
        xrb, xib = recon_bf(ema_params, yr_b, yi_b, jax.random.PRNGKey(9))
        mag_bf = jnp.sqrt(xrb ** 2 + xib ** 2).mean(axis=0)
        bf16_metrics = {
            "bf16_nrmse": float(nrmse(mag_bf, jnp.abs(truth[0]))),
            "bf16_ssim": float(ssim(mag_bf[..., 0], jnp.abs(truth[0, ..., 0]))),
            "bf16_wall_s": round(time.time() - t0, 1),
        }
        print(f"[demo] bf16 recon: NRMSE {bf16_metrics['bf16_nrmse']:.4f} / "
              f"SSIM {bf16_metrics['bf16_ssim']:.4f} "
              f"({bf16_metrics['bf16_wall_s']}s)", flush=True)

        # int8 serving path (ops/quant.py): bf16 glue + s8xs8->s32 MXU
        # convs — the quality gate the quant docstrings point at
        from inverseproblemwithdiffusionmodel_tpu.ops.quant import (
            quantized_convs)

        class _Int8Wrap:
            def apply(self, variables, x, cond):
                with quantized_convs("int8"):
                    return _BF16Wrap().apply(variables, x, cond)

        recon_q = make_stepped_pair_reconstructor(
            _Int8Wrap(), sigmas, op,
            PairL2Penalty.with_normal_kernel(op, num_iters=6),
            cfg, lr_scaled=args.lr_scaled)
        t0 = time.time()
        xrq, xiq = recon_q(ema_params, yr_b, yi_b, jax.random.PRNGKey(9))
        mag_q = jnp.sqrt(xrq ** 2 + xiq ** 2).mean(axis=0)
        bf16_metrics.update({
            "int8_nrmse": float(nrmse(mag_q, jnp.abs(truth[0]))),
            "int8_ssim": float(ssim(mag_q[..., 0], jnp.abs(truth[0, ..., 0]))),
            "int8_wall_s": round(time.time() - t0, 1),
        })
        print(f"[demo] int8 recon: NRMSE {bf16_metrics['int8_nrmse']:.4f} / "
              f"SSIM {bf16_metrics['int8_ssim']:.4f} "
              f"({bf16_metrics['int8_wall_s']}s)", flush=True)

    t_mag = jnp.abs(truth[0])
    m = {
        "zf_nrmse": float(nrmse(zf_mag[0], t_mag)),
        "zf_ssim": float(ssim(zf_mag[0, ..., 0], t_mag[..., 0])),
        "nrmse": float(nrmse(mean_mag, t_mag)),
        "ssim": float(ssim(mean_mag[..., 0], t_mag[..., 0])),
        "recon_wall_s": round(wall, 1),
        "ald_steps": args.levels * 5,
        "chains": args.chains,
        **bf16_metrics,
    }
    print(f"[demo] R={args.R}: ZF NRMSE {m['zf_nrmse']:.4f} / "
          f"SSIM {m['zf_ssim']:.4f}  ->  recon NRMSE {m['nrmse']:.4f} / "
          f"SSIM {m['ssim']:.4f}  ({wall:.1f}s, {args.chains} chains)",
          flush=True)

    # assemble complex on the HOST (complex dtypes are unimplemented on
    # some TPU backends)
    host = lambda a: np.asarray(jax.device_get(a))
    np.save(os.path.join(args.out, "original.npy"),
            host(xr_true) + 1j * host(xi_true))
    np.save(os.path.join(args.out, "reconstructions.npy"),
            host(xr) + 1j * host(xi))
    np.save(os.path.join(args.out, "ZF.npy"), host(zr) + 1j * host(zi))
    import json
    with open(os.path.join(args.out, "args.json"), "w") as f:
        json.dump({**vars(args), **m}, f, indent=2)
    try:
        from inverseproblemwithdiffusionmodel_tpu.utils.visualizations import (
            create_sample_grid_plot)
        create_sample_grid_plot(args.out)
    except Exception as e:
        print(f"[demo] figure skipped: {e}")
    return m


if __name__ == "__main__":
    main()
