"""Benchmark: ALD reconstruction steps/sec/chip on the ACDC R=8 4-coil SENSE
workload (BASELINE.json metric).

One ALD step = one batched Re/Im NCSNv2Deepest forward (ngf=128 at 256^2,
the net the reference uses for every ACDC recon, helpers/load_model.py:24)
+ a proximal data-consistency solve — the hot loop of
scripts/acdc_SENSE_real_img.py. The whole chain is one jitted lax.scan over
a shortened sigma ladder (per-step cost is level-independent); we report
ALD steps/sec for a single chain on one chip.

The reconstruction uses the real-pair pipeline (operators/pair.py +
samplers/ald_pair.py): complex math as (re, im) float32 pairs and the
centered DFT as MXU matmuls — numerically identical to the complex path
(tests/test_pair_ops.py) and the fast/portable formulation on TPU, where
complex64 is emulated (or absent entirely).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ALD_steps/sec/chip", "vs_baseline": N}
vs_baseline is vs BENCH_BASE (the first recorded TPU value); the reference
publishes no throughput numbers.

Wedge-proofing (the round-1 driver run hung in eager pre-chain dispatch and
recorded nothing, BENCH_r01.json rc=124): when targeting the TPU relay this
script runs as a PARENT that (a) probes the relay with a tiny subprocess job
under a timeout, (b) runs the real bench in a child subprocess under a
wall-clock deadline with one kill-and-relaunch retry (fresh axon clients
that wedge at connect usually succeed on relaunch), and (c) ALWAYS prints
the JSON line — flagged "degraded" (with the last-known-good cached value,
if any) when it had to bail. The child itself does no eager pre-chain
device work: measurement synthesis and chain init are single jitted
programs.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax

# Honor JAX_PLATFORMS explicitly: the axon sitecustomize pins
# jax_platforms at interpreter start, so the env var alone is ignored —
# without this, a CPU-pinned bench invocation (e.g. the driver-hook smoke
# test) silently talks to the TPU relay instead.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
_IPDM_CACHE = os.path.expanduser(
    "~/.cache/ipdm_jax_cpu"   # CPU AOT entries are machine-specific:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else "~/.cache/ipdm_jax")  # never share with the axon remote-compile cache


# persistent compilation cache: recon compiles once per geometry, later
# bench invocations (and driver re-runs) start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 _IPDM_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from inverseproblemwithdiffusionmodel_tpu.config import load_config
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2Deepest
from inverseproblemwithdiffusionmodel_tpu.operators.masks import generate_mask
from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
    MASK_PRESETS, _exp_sens_map)
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairSENSE, PairL2Penalty)
from inverseproblemwithdiffusionmodel_tpu.samplers.ald import ALDConfig
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    ald_inverse_proximal_pair)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder

# First recorded TPU v5e value (2026-08-16, steps mode, 256^2 ngf128):
DEFAULT_BASE = float(os.environ.get("BENCH_BASE", "29.288"))


def _log(msg: str):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_pair_sense(num_sens: int, R: int, size: int, seed: int) -> PairSENSE:
    """Pair-form SENSE built directly (no complex intermediates)."""
    import numpy as np
    preset = MASK_PRESETS[R]
    m = generate_mask(1, size, seed=seed, **preset).reshape(-1, 1, size, 1)
    maps = np.stack([_exp_sens_map(size, size, seed + i)
                     for i in range(num_sens)])
    maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))
    return PairSENSE(mask=jnp.asarray(m, jnp.float32),
                     sens_re=jnp.asarray(maps[..., None], jnp.float32),
                     sens_im=jnp.zeros((num_sens, size, size, 1),
                                       jnp.float32))


_CHILD_MARK = "_IPDM_BENCH_CHILD"
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _IPDM_CACHE)
_LAST_GOOD = os.path.join(_CACHE_DIR, "last_bench.json")


def _is_cpu_pinned() -> bool:
    return os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"


def _probe_relay(timeout_s: float) -> bool:
    """Run a trivial jitted program in a fresh subprocess under a timeout.
    A wedged relay leaves new clients stuck at connect (all threads in
    futex, no socket — see CLAUDE.md); the subprocess boundary lets us kill
    and relaunch, which usually cures a wedged connect."""
    code = ("import jax, jax.numpy as jnp; "
            "print('probe', float(jax.jit(lambda x: (x * 2).sum())"
            "(jnp.ones(128))))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              timeout=timeout_s, capture_output=True,
                              text=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_bench_child(timeout_s: float):
    """Run the real bench in a subprocess; return the parsed JSON record or
    None. The subprocess is killed at the deadline (TimeoutExpired)."""
    env = dict(os.environ)
    env[_CHILD_MARK] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=timeout_s, capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired as e:
        tail = e.stderr if e.stderr is not None else ""
        _log(f"bench child hit {timeout_s:.0f}s deadline; killed. stderr "
             f"tail: {str(tail)[-500:]!r}")
        return None
    sys.stderr.write((proc.stderr or "")[-3000:])
    if proc.returncode != 0:
        _log(f"bench child failed rc={proc.returncode}")
        return None
    for line in reversed((proc.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    _log("bench child printed no JSON line")
    return None


def _emit(rec: dict):
    print(json.dumps(rec), flush=True)


def _degraded_exit():
    """Always leave a JSON line: the last-known-good value (flagged) if one
    was recorded this machine, else an explicit zero."""
    try:
        with open(_LAST_GOOD) as f:
            rec = json.load(f)
        rec["degraded"] = True
        rec["cached"] = True
        rec["metric"] = "DEGRADED (relay unavailable; cached last-good) " \
            + str(rec.get("metric", ""))
        _emit(rec)
        return
    except (OSError, json.JSONDecodeError):
        pass
    _emit({"metric": "DEGRADED: TPU relay unavailable, no cached value",
           "value": 0.0, "unit": "ALD_steps/sec/chip", "vs_baseline": 0.0,
           "degraded": True})


def _orchestrate():
    """Parent mode: probe, then run the bench child under a deadline with
    one kill-and-relaunch retry; always print a JSON line."""
    # default fits under the driver's observed ~1200s kill with margin;
    # warm-cache child finishes in ~3-5 min, cold compile ~14 min
    t_end = time.monotonic() + float(os.environ.get("BENCH_DEADLINE", "1080"))

    def remaining() -> float:
        return t_end - time.monotonic()

    probe_ok = False
    for attempt in (1, 2):
        # 40s standalone on a quiet host; margin for compile-service load
        budget = min(240.0, remaining() - 120.0)
        if budget <= 10:
            break
        _log(f"relay probe attempt {attempt} (budget {budget:.0f}s)")
        if _probe_relay(budget):
            probe_ok = True
            _log("relay probe ok")
            break
        _log("probe wedged/failed — relaunching")
    if not probe_ok:
        _log("relay unreachable; emitting degraded record")
        _degraded_exit()
        return

    for attempt in (1, 2):
        budget = remaining() - (90.0 if attempt == 1 else 15.0)
        if attempt == 1:
            budget = min(budget, 0.7 * (remaining() - 30.0))
        if budget <= 30:
            break
        _log(f"bench child attempt {attempt} (budget {budget:.0f}s)")
        rec = _run_bench_child(budget)
        if rec is not None:
            _emit(rec)
            if not rec.get("degraded"):
                try:
                    os.makedirs(_CACHE_DIR, exist_ok=True)
                    with open(_LAST_GOOD, "w") as f:
                        json.dump(rec, f)
                except OSError:
                    pass
            return
    _degraded_exit()


def _bench_impl():
    on_cpu = jax.default_backend() == "cpu"
    # batch = ensemble chains per chip: reconstruction quality comes from
    # chain ensembles (README's "mean of 105"), and per-sample cost drops
    # ~6x from B=1 to B=8 on v5e - the aggregate is the production metric
    size, ngf, levels, n_steps, batch = (64, 32, 2, 2, 1) if on_cpu \
        else (256, 128, 8, 3, 16)
    size = int(os.environ.get("BENCH_SIZE", size))
    ngf = int(os.environ.get("BENCH_NGF", ngf))
    levels = int(os.environ.get("BENCH_LEVELS", levels))
    n_steps = int(os.environ.get("BENCH_NSTEPS", n_steps))
    batch = int(os.environ.get("BENCH_BATCH", batch))

    config = load_config("ACDC", "real-imag")
    config = config.replace(**{"data.image_size": size, "model.ngf": ngf})

    module = NCSNv2Deepest(config=config)
    sigmas = sigma_ladder(config.model.sigma_begin, config.model.sigma_end,
                          levels, "geometric")
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, size, size, 1))
    # jitted init: eager flax init is minutes-slow over remote-dispatch
    params = jax.jit(module.init)(key, x0, jnp.ones((batch,)))["params"]
    _log("init done")

    lin_tfm = make_pair_sense(num_sens=4, R=8, size=size, seed=0)

    # measurement synthesis as ONE jitted program (the round-1 driver run
    # wedged right here when it was an eager per-op dispatch chain over the
    # relay); lin_tfm rides along as a pytree argument
    @jax.jit
    def synth_measurement(lin_tfm, key):
        k1, k2 = jax.random.split(key)
        mag = jax.random.uniform(k1, (batch, size, size, 1))
        phase = jax.random.normal(k2, (batch, size, size, 1))
        return lin_tfm(mag * jnp.cos(phase), mag * jnp.sin(phase))

    yr, yi = synth_measurement(lin_tfm, key)
    _log("measurement synthesized")

    # normal-kernel fast path: the Cartesian line mask makes A^H A a single
    # precomputed WxW matmul per coil per CG iteration (H-axis DFTs cancel);
    # A^H y is baked in by the samplers (_bake_ahy) so the CG setup reuses
    # the chain init instead of recomputing a SENSE adjoint per inner step
    proximal = PairL2Penalty.with_normal_kernel(lin_tfm, num_iters=4)
    ald_cfg = ALDConfig(n_steps_each=n_steps, step_lr=config.sampling.step_lr)

    # params are an explicit jit argument: closing over them would inline
    # ~4e8 bytes of constants into the lowered HLO (minutes to lower, and
    # remote-compile request bodies blow past size limits)
    mode = os.environ.get("BENCH_MODE", "steps")
    dtype = os.environ.get("BENCH_DTYPE", "bf16" if not on_cpu else "f32")
    if dtype in ("bf16", "int8"):
        # bf16 quality-validated on trained weights: recon NRMSE/SSIM
        # identical to f32; int8 (bf16 glue + s8xs8->s32 MXU convs,
        # ops/quant.py) validated to recon-metric parity — both checks in
        # examples/train_and_reconstruct_demo.py
        fwd_module = module
        if dtype == "int8":
            from inverseproblemwithdiffusionmodel_tpu.ops.quant import (
                quantized_convs)

        class _LowPrecModule:
            @staticmethod
            def apply(variables, x, cond):
                def fwd():
                    pbf = jax.tree_util.tree_map(
                        lambda v: v.astype(jnp.bfloat16), variables["params"])
                    out = fwd_module.apply({"params": pbf},
                                           x.astype(jnp.bfloat16),
                                           cond.astype(jnp.bfloat16))
                    return out.astype(jnp.float32)
                if dtype == "int8":
                    with quantized_convs("int8"):
                        return fwd()
                return fwd()

        module = _LowPrecModule()

    @jax.jit
    def recon_scan(params, yr, yi, k):
        """Whole chain as ONE XLA program (the deployment formulation)."""
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        return ald_inverse_proximal_pair(
            score_fn, sigmas, (yr, yi), lin_tfm, proximal, k, ald_cfg,
            lr_scaled=5.0)

    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import (
        _labels, _langevin_update)
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import (
        stack_parts, unstack_parts)
    sigma_last = sigmas[-1]

    @jax.jit
    def level_step(params, prox, xr, xi, yr, yi, c, sigma, key):
        """One sigma level (n_steps inner updates + prox). Compiles like a
        single forward; the level loop runs on the host with async dispatch
        - the fallback when the remote-compile service rejects the full
        scanned program. The proximal is a jit ARGUMENT (pytree): closing
        over it would inline the coil maps + baked A^H y as HLO constants."""
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        step_size = ald_cfg.step_lr * (sigma / sigma_last) ** 2

        def inner(_, state):
            xr, xi, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(xr, xi)
            grads = score_fn(stacked, _labels(stacked, c))
            g_re, g_im = unstack_parts(grads)
            xr = _langevin_update(xr, g_re, step_size, k_re)
            xi = _langevin_update(xi, g_im, step_size, k_im)
            xr, xi = prox(xr, xi, yr, yi,
                          ald_cfg.step_lr * 5.0, 1.0)
            return xr, xi, key

        return jax.lax.fori_loop(0, ald_cfg.n_steps_each, inner,
                                 (xr, xi, key))

    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        _bake_ahy)

    @jax.jit
    def chain_init(lin_tfm, yr, yi):
        """A^H y as one program (vs an eager op chain over the relay)."""
        return lin_tfm.conj_op(yr, yi)

    def recon_steps(params, yr, yi, k):
        xr, xi = chain_init(lin_tfm, yr, yi)
        prox = _bake_ahy(proximal, xr, xi)
        for c in range(levels):
            xr, xi, k = level_step(params, prox, xr, xi, yr, yi,
                                   jnp.int32(c), sigmas[c], k)
        return xr, xi

    recon = recon_scan if mode == "scan" else recon_steps

    def run_fetch(i: int) -> float:
        """Run a chain and force a device->host scalar read (the only
        trustworthy sync over remote-dispatch backends)."""
        xr, xi = recon(params, yr, yi, jax.random.PRNGKey(i))
        return float(jnp.abs(xr).sum() + jnp.abs(xi).sum())

    _log("compiling recon...")
    run_fetch(1)  # compile + warm-up
    _log("warm-up done")
    times = []
    for i in range(2, 5):
        t0 = time.perf_counter()
        run_fetch(i)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    total_steps = levels * n_steps * batch   # chain-steps across the batch
    value = total_steps / elapsed
    rec = {
        "metric": "ALD chain-steps/sec/chip (ACDC R=8 SENSE, "
                  f"{size}^2 ngf{ngf}, {batch} chains, {dtype}, "
                  f"backend={jax.default_backend()})",
        "value": round(value, 3),
        "unit": "ALD_steps/sec/chip",
        "vs_baseline": round(value / DEFAULT_BASE, 3),
    }
    # x8-chip ICI projection (linear: zero tensor collectives in the
    # hot loop, tests/test_parallel.py census invariant) vs the
    # generous A100 model for the reference implementation
    # (42.4 chain-steps/s: perfectly batched TF32 at 45% peak —
    # arithmetic in BASELINE.md "Current standing vs the north star").
    # The A100 model is derived at the 256^2/ngf128/16-chain geometry
    # ONLY — at any other BENCH_SIZE/NGF/BATCH the ratio is meaningless,
    # so it is not emitted.
    if (size, ngf, batch) == (256, 128, 16):
        rec["vs_a100x8_est"] = round(value * 8 / 42.4, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    # CPU-pinned invocations (tests, driver smoke) and the bench child run
    # the measurement directly; a TPU-relay invocation goes through the
    # wedge-proof parent orchestration.
    if _is_cpu_pinned() or os.environ.get(_CHILD_MARK) == "1":
        _bench_impl()
    else:
        _orchestrate()
