"""Full-budget ACDC 256^2 prior training (reference recipe).

Trains NCSNv2Deepest ngf128 with the reference's FULL training budget —
`/root/reference/ncsn/configs/acdc.yml`: n_iters 80001, batch_size 3,
Adam lr 1e-4, random horizontal flip (data.random_flip: true), EMA 0.999
(model.ema_rate) — on synthetic short-axis phantoms (the real ACDC `.npz`
are not redistributable). Round 2 trained only 14k steps at B=8 and the
ALD stability edge sat ~20x below the 64^2 experiment's; this run is the
budget the round-2 diagnosis calls for (docs/RESULTS_ACDC_SENSE.md).

TPU specifics:
- The sigma ladder is computed EXACTLY as `examples/acdc_sense_ensemble.py`
  computes it (sigma_max from the same 400-slice dataset draw) so the
  reconstruction script can reload this prior against an identical ladder.
- The training SET is larger (--n_train 2000 phantoms vs the ladder's 400)
  to match the reference's real-data scale (ACDC: ~1.9k slices) — 80k x 3
  presentations over only 400 phantoms would be 600 epochs of the same
  images and overfitting, not prior quality.
- --scan_k steps are fused into ONE jitted lax.scan program: the axon
  relay costs ~26 ms fixed dispatch per program (CLAUDE.md), which at
  B=3 (~0.15 s compute/step) would be ~15% overhead host-stepped.
- Retained snapshots every --snap_every steps (EMA + raw params) feed the
  round-3 checkpoint-sweep stability experiment (VERDICT.md task 2:
  stability edge vs training budget, EMA-vs-raw).

Run (background, ~3-5 h on one v5e chip):
  python examples/train_acdc_prior.py --out runs/acdc_prior_80k
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


# persistent compile cache (same knobs as bench.py): restarts of this
# script skip the ~minutes-long 256^2 ngf128 remote compile
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 _IPDM_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from flax import serialization

from acdc_sense_ensemble import make_dataset  # noqa: E402
from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.models.registry import get_network
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_score_train_step)
from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
    max_pairwise_distance)


def log(msg):
    print(f"[train80k] {msg}", flush=True)


def save_params(path, params):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    os.replace(tmp, path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--ngf", type=int, default=128)
    p.add_argument("--n_train", type=int, default=2000)
    p.add_argument("--ladder_n", type=int, default=400,
                   help="dataset draw used ONLY for sigma_max, matching "
                        "acdc_sense_ensemble.py's default --n_train")
    p.add_argument("--levels", type=int, default=2311)
    p.add_argument("--batch", type=int, default=3,
                   help="reference acdc.yml training.batch_size")
    p.add_argument("--steps", type=int, default=80001,
                   help="reference acdc.yml training.n_iters")
    p.add_argument("--scan_k", type=int, default=8,
                   help="train steps fused per jitted dispatch")
    p.add_argument("--snap_every", type=int, default=10000)
    p.add_argument("--ckpt_every", type=int, default=2000,
                   help="rolling resume-checkpoint cadence (full state)")
    p.add_argument("--sync_every", type=int, default=8,
                   help="force a device->host scalar fetch every N chunks: "
                        "caps the async dispatch queue (un-synced, the host "
                        "runs ~125 chunks ahead and the 16MB/chunk RPC "
                        "flood wedges the axon relay — observed r3)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eps", type=float, default=1e-3,
                   help="Adam eps — the reference recipe trains with 1e-3 "
                        "(acdc.yml optim.eps), not the torch default 1e-8")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="0 disables (reference: no clipping — acdc.yml has "
                        "no grad_clip and the Lightning trainer sets none)")
    p.add_argument("--no_flip", action="store_true")
    p.add_argument("--finalize", action="store_true",
                   help="resume the rolling checkpoint and immediately "
                        "write prior.msgpack / raw_final.msgpack from it "
                        "(no training) — extracts the EMA prior when a run "
                        "is stopped between snapshots. Pass the SAME "
                        "--steps/--batch/--n_train as the run (fingerprint)")
    p.add_argument("--warm_start", default=None,
                   help="artifact dir (examples/export_prior_artifact.py: "
                        "raw_bf16.msgpack + ema_bf16.msgpack + META.json). "
                        "Used only when no rolling checkpoint matches: "
                        "params/EMA are restored (cast back to f32) and "
                        "training continues from META step with a FRESH "
                        "Adam state (moments re-warm in O(100) steps) — "
                        "the cross-round resume path, since runs/ does not "
                        "survive rounds but git-tracked artifacts/ does")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/acdc_prior_80k")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    S = args.size

    # ---- ladder: EXACTLY the recon script's computation ---------------
    ladder_data = make_dataset(args.ladder_n, S, args.seed)
    sigma_max = max_pairwise_distance(ladder_data, max_samples=256)
    sigmas = sigma_ladder(sigma_max, 0.01, args.levels)
    log(f"ladder: sigma_max {sigma_max:.1f}, {args.levels} levels")

    # ---- training set -------------------------------------------------
    # RandomState(seed) draws sequentially, so the first ladder_n slices
    # are the SAME images the recon script trains/loads against
    t0 = time.time()
    data = (ladder_data if args.n_train <= args.ladder_n
            else make_dataset(args.n_train, S, args.seed))
    log(f"train set {data.shape} ({time.time() - t0:.0f}s to synthesize)")

    config = Config({"data": {"channels": 1, "image_size": S,
                              "logit_transform": False, "rescaled": False},
                     "model": {"ngf": args.ngf, "nonlinearity": "elu",
                               "normalization": "InstanceNorm++"}})
    module = get_network(config)
    log(f"arch: {type(module).__name__}")

    x0 = jnp.zeros((args.batch,) + data.shape[1:])
    params = jax.jit(module.init)(jax.random.PRNGKey(args.seed), x0,
                                  jnp.ones((args.batch,)))["params"]
    opt_cfg = Config({"optim": {"optimizer": "Adam", "lr": args.lr,
                                "beta1": 0.9, "eps": args.eps,
                                "weight_decay": 0.0,
                                "grad_clip": args.grad_clip}})
    state = TrainState.create(params, get_optimizer(opt_cfg),
                              ema_decay=0.999)

    shapes = str([tuple(np.shape(l))
                  for l in jax.tree_util.tree_leaves(params)])
    fp = hashlib.sha1(
        f"{args.steps}|{args.seed}|{args.batch}|{args.n_train}|{args.lr}|"
        f"{args.no_flip}|{args.ladder_n}|{shapes}".encode()).hexdigest()[:12]
    ckpt_path = os.path.join(args.out, "train_state.ckpt")
    fp_path = ckpt_path + ".fp"
    start = 0
    if os.path.exists(ckpt_path):
        saved_fp = (open(fp_path).read().strip()
                    if os.path.exists(fp_path) else "<missing>")
        if saved_fp != fp:
            log("ignoring stale checkpoint (settings changed)")
        else:
            try:
                restored = serialization.from_bytes(
                    {"step": 0, "state": state},
                    open(ckpt_path, "rb").read())
                start, state = restored["step"], restored["state"]
                state = jax.device_put(state)  # from_bytes leaves are host
                log(f"resumed at step {start}")
            except Exception as e:
                # optimizer-structure changes (e.g. dropping grad-clip from
                # the optax chain) make the full-state restore fail; the
                # params/EMA/step live at fixed paths in the raw msgpack
                # and are optimizer-agnostic — recover those and let Adam
                # moments rebuild (O(100) steps), instead of silently
                # discarding hours of training
                try:
                    blob = serialization.msgpack_restore(
                        open(ckpt_path, "rb").read())
                    st = blob["state"]
                    params2 = serialization.from_state_dict(
                        state.params, st["params"])
                    ema2 = serialization.from_state_dict(
                        state.ema.params, st["ema"]["params"])
                    start = int(blob["step"])
                    state = state.replace(
                        params=params2,
                        ema=state.ema.replace(params=ema2),
                        step=jnp.asarray(start, jnp.int32))
                    state = jax.device_put(state)
                    log(f"recovered params+EMA at step {start} from "
                        f"checkpoint with mismatched optimizer structure "
                        f"(fresh Adam moments; original error: {e})")
                except Exception as e2:
                    log(f"ignoring unreadable checkpoint ({e}; "
                        f"recovery failed: {e2})")

    if start == 0 and args.warm_start and not args.finalize:
        import json as _json
        meta = _json.load(open(os.path.join(args.warm_start, "META.json")))

        def _load_into(target, name):
            tree = serialization.msgpack_restore(
                open(os.path.join(args.warm_start, name), "rb").read())
            tree = serialization.from_state_dict(target, tree)
            return jax.tree_util.tree_map(
                lambda t, s: jnp.asarray(s, jnp.asarray(t).dtype),
                target, tree)

        raw = _load_into(state.params, "raw_bf16.msgpack")
        ema = _load_into(state.ema.params, "ema_bf16.msgpack")
        start = int(meta["step"])
        state = state.replace(params=raw,
                              ema=state.ema.replace(params=ema),
                              step=jnp.asarray(start, jnp.int32))
        state = jax.device_put(state)
        log(f"warm-started from {args.warm_start} at step {start} "
            "(fresh Adam moments)")

    if args.finalize:
        if start == 0:
            raise SystemExit("--finalize: no matching checkpoint to "
                             f"finalize in {args.out}")
        save_params(os.path.join(args.out, "prior.msgpack"),
                    state.eval_params)
        save_params(os.path.join(args.out, "raw_final.msgpack"),
                    state.params)
        log(f"finalized at step {start}: prior.msgpack (EMA) + "
            "raw_final.msgpack written")
        return

    dt = None if jax.default_backend() == "cpu" else jnp.bfloat16
    step = make_score_train_step(module, sigmas, data_mode="real-imag",
                                 compute_dtype=dt)

    K = args.scan_k

    # The dataset lives ON DEVICE for the whole run (2000 x 256^2 f32 =
    # 524 MB, far under v5e HBM); each chunk ships only (K, B) int32
    # indices + flip bits + step ids. The first version of this loop
    # synthesized batches on host and uploaded 6.3 MB per chunk over the
    # relay plus K eager fold_in dispatches — measured 3.3 steps/s at B=3
    # vs compute-bound ~6+. Gather/flip/fold_in are traced into the chunk.
    # `dset` is a jit ARGUMENT (closing over it would inline 524 MB of HLO
    # constants — see CLAUDE.md) and the same device buffer every call, so
    # it is never re-uploaded.
    def chunk_fn(st, dset, base_key, idx, flip, step_ids):
        def body(s, xs):
            ii, ff, sid = xs
            b = dset[ii]
            b = jnp.where(ff[:, None, None, None], b[:, :, ::-1], b)
            s2, loss = step(s, b, jax.random.fold_in(base_key, sid))
            return s2, loss
        st, losses = jax.lax.scan(body, st, (idx, flip, step_ids))
        return st, losses.mean()

    chunk = jax.jit(chunk_fn, donate_argnums=(0,))

    base_key = jax.random.PRNGKey(args.seed + 1)
    log_every = 1000

    def host_draw(i):
        """Deterministic per-step (idx, flip) — the SAME RandomState draws
        as the original host-side batch synthesis, so the training stream
        is bit-identical and replayable across resume."""
        rs = np.random.RandomState([args.seed, i])
        idx = rs.choice(len(data), args.batch)
        flip = (rs.rand(args.batch) < 0.5) if not args.no_flip \
            else np.zeros(args.batch, bool)
        return idx, flip

    dset = jax.device_put(jnp.asarray(data))
    t0, done0 = time.time(), start
    loss_hist = []
    i = start
    while i < args.steps:
        k_here = min(K, args.steps - i)
        draws = [host_draw(i + j) for j in range(k_here)]
        if k_here < K:   # ragged tail: pad by tiling (extra steps are
            # harmless — they continue training deterministically)
            reps = -(-K // k_here)
            draws = (draws * reps)[:K]
        idx = jnp.asarray(np.stack([d[0] for d in draws]), jnp.int32)
        flip = jnp.asarray(np.stack([d[1] for d in draws]))
        step_ids = jnp.arange(i, i + K, dtype=jnp.int32)
        state, mean_loss = chunk(state, dset, base_key, idx, flip,
                                 step_ids)
        prev_i, i = i, i + K
        if args.sync_every and (i // (K * args.sync_every)) != (
                prev_i // (K * args.sync_every)):
            float(mean_loss)
        if (i // log_every) != (prev_i // log_every) or i >= args.steps:
            ml = float(mean_loss)   # device sync
            loss_hist.append((i, ml))
            rate = (i - done0) / max(time.time() - t0, 1e-9)
            eta = (args.steps - i) / max(rate, 1e-9) / 3600
            log(f"step {i}: loss {ml:.2f} ({rate:.2f} steps/s, "
                f"eta {eta:.2f}h)")
        if (i // args.snap_every) != (prev_i // args.snap_every):
            snap = (i // args.snap_every) * args.snap_every
            save_params(os.path.join(args.out, f"prior_{snap:06d}.msgpack"),
                        state.eval_params)
            save_params(os.path.join(args.out, f"raw_{snap:06d}.msgpack"),
                        state.params)
            log(f"snapshot {snap} saved")
        if (i // args.ckpt_every) != (prev_i // args.ckpt_every):
            blob = serialization.to_bytes(
                {"step": i, "state": jax.device_get(state)})
            tmp = ckpt_path + ".tmp"
            open(tmp, "wb").write(blob)
            os.replace(tmp, ckpt_path)
            tmp_fp = fp_path + ".tmp"
            open(tmp_fp, "w").write(fp)
            os.replace(tmp_fp, fp_path)

    # final prior in the layout acdc_sense_ensemble.py expects
    save_params(os.path.join(args.out, "prior.msgpack"), state.eval_params)
    save_params(os.path.join(args.out, "raw_final.msgpack"), state.params)
    np.savetxt(os.path.join(args.out, "loss_history.txt"),
               np.asarray(loss_hist))
    log(f"done: {args.steps} steps in {(time.time() - t0) / 3600:.2f}h "
        f"(this process)")


if __name__ == "__main__":
    main()
