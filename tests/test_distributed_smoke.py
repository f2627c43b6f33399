"""2-process jax.distributed smoke for parallel/distributed.py.

The multi-host init path (SURVEY §2.7 DCN scale-out) gets a REAL
multi-process exercise on one host: two subprocesses form a cluster over a
loopback coordinator with gloo CPU collectives, build a global mesh over
both processes' devices, feed per-process shards via `local_batch_slice` +
`jax.make_array_from_process_local_data`, and psum across the process
boundary. This is the same code path a TPU pod entrypoint runs (with ICI/
DCN instead of gloo)."""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    pid = int(sys.argv[1])
    port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, %r)
    from inverseproblemwithdiffusionmodel_tpu.parallel.distributed import (
        initialize_distributed, is_primary, local_batch_slice)
    ok = initialize_distributed(
        coordinator_address="127.0.0.1:" + port,
        num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    sl = local_batch_slice(4)
    local = np.arange(4, dtype=np.float32)[sl]
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (4,))
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == 6.0, float(total)
    print("RESULT", pid, is_primary(), float(total))
""" % REPO)


def test_two_process_cluster_psum(tmp_path):
    port = "19741"
    env = dict(os.environ)
    # the child pins its own platform; scrub the test-session virtual-device
    # flags so each child owns its own device world
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-c", _CHILD, str(pid), port],
                         env=env, cwd=str(tmp_path),
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\n{err[-2000:]}"
    results = sorted(line for rc, out, _ in outs
                     for line in out.splitlines() if line.startswith("RESULT"))
    assert results == ["RESULT 0 True 6.0", "RESULT 1 False 6.0"], results
