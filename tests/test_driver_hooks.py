"""Smoke tests for the two repo-root driver entry points.

The round driver compile-checks `__graft_entry__.entry()` single-chip, runs
`__graft_entry__.dryrun_multichip(n)` on a virtual host-device mesh, and
executes `bench.py` at round end (its one JSON line becomes BENCH_r{N}.json).
A regression in either file would otherwise only surface at scoring time.
"""
import json
import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _graft_entry():
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import __graft_entry__
    return __graft_entry__


def test_entry_lowers_single_chip():
    fn, args = _graft_entry().entry()
    lowered = jax.jit(fn).lower(*args)
    assert "conv" in lowered.as_text().lower()


def test_dryrun_multichip_8():
    _graft_entry().dryrun_multichip(8)


def test_bench_cpu_prints_one_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # shrink below even the CPU defaults: this guards the harness wiring
    # (imports, JSON contract), not throughput
    env.update(BENCH_SIZE="32", BENCH_NGF="8", BENCH_LEVELS="1",
               BENCH_NSTEPS="1", BENCH_BATCH="1")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    # vs_a100x8_est is emitted ONLY at the calibrated default geometry
    # (256^2 ngf128 x16 chains) — this shrunken run must NOT carry it
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "ALD_steps/sec/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
