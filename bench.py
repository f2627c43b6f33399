"""Benchmark: ALD reconstruction steps/sec/chip on the ACDC R=8 4-coil SENSE
workload (BASELINE.json metric).

One ALD step = one batched Re/Im NCSNv2Deepest forward (ngf=128 at 256^2,
the net the reference uses for every ACDC recon, helpers/load_model.py:24)
+ a proximal data-consistency solve (SENSE FFT pairs) — the hot loop of
scripts/acdc_SENSE_real_img.py. The whole chain is one jitted lax.scan; we
run a shortened sigma ladder (per-step cost is level-independent) and report
steps/sec for a single chain on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ALD_steps/sec/chip", "vs_baseline": N}
vs_baseline is vs the first recorded TPU run of this bench (BENCH_BASE env or
the constant below); the reference publishes no throughput numbers.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from inverseproblemwithdiffusionmodel_tpu.config import load_config
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2Deepest
from inverseproblemwithdiffusionmodel_tpu.operators.fourier import make_sense
from inverseproblemwithdiffusionmodel_tpu.operators.proximal import L2Penalty
from inverseproblemwithdiffusionmodel_tpu.samplers.ald import (
    ALDConfig, ald_inverse_seg_proximal_real_imag)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder

# First recorded value on the target chip; updated as the kernel work lands.
DEFAULT_BASE = float(os.environ.get("BENCH_BASE", "1.0"))


def main():
    on_tpu = jax.default_backend() == "tpu"
    # Full ACDC geometry on TPU; tiny stand-in on CPU (driver runs on TPU).
    if on_tpu:
        size, ngf, levels, n_steps, batch = 256, 128, 24, 3, 1
    else:
        size, ngf, levels, n_steps, batch = 64, 32, 2, 2, 1

    config = load_config("ACDC", "real-imag")
    config = config.replace(**{"data.image_size": size, "model.ngf": ngf})

    module = NCSNv2Deepest(config=config)
    sigmas = sigma_ladder(config.model.sigma_begin, config.model.sigma_end,
                          levels, "geometric")
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, size, size, 1))
    params = module.init(key, x0, jnp.ones((batch,)))["params"]

    def score_fn(x, labels):
        return module.apply({"params": params}, x, sigmas[labels])

    # R=8 4-coil SENSE measurement of a random complex phantom
    lin_tfm = make_sense("exp", num_sens=4, R=8, center_lines_frac=0.06,
                         in_shape=(size, size, 1), seed=0, num_frames=1)
    k1, k2 = jax.random.split(key)
    phantom = (jax.random.uniform(k1, (batch, size, size, 1)) *
               jnp.exp(1j * jax.random.normal(k2, (batch, size, size, 1))))
    measurement = lin_tfm(phantom.astype(jnp.complex64))

    proximal = L2Penalty(lin_tfm=lin_tfm, num_iters=4)
    ald_cfg = ALDConfig(n_steps_each=n_steps, step_lr=config.sampling.step_lr)

    @jax.jit
    def recon(y, k):
        return ald_inverse_seg_proximal_real_imag(
            score_fn, sigmas, y, lin_tfm, proximal, k, ald_cfg, lr_scaled=5.0)

    k_run = jax.random.PRNGKey(1)
    jax.block_until_ready(recon(measurement, k_run))  # compile + warm-up
    t0 = time.perf_counter()
    jax.block_until_ready(recon(measurement, k_run))
    elapsed = time.perf_counter() - t0

    total_steps = levels * n_steps
    value = total_steps / elapsed
    print(json.dumps({
        "metric": "ALD sampler steps/sec/chip (ACDC R=8 SENSE, "
                  f"{size}^2 ngf{ngf}, backend={jax.default_backend()})",
        "value": round(value, 3),
        "unit": "ALD_steps/sec/chip",
        "vs_baseline": round(value / DEFAULT_BASE, 3),
    }))


if __name__ == "__main__":
    main()
