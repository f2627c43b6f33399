"""Multi-host (TPU pod / multi-process) runtime initialization.

The reference is strictly single-process (SURVEY.md §2.7); this module is
the TPU-native scale-out path beyond one host: `jax.distributed` brings up
the cross-host runtime (DCN control plane), after which `jax.devices()`
spans every chip in the slice and the SAME `make_mesh()` +
`NamedSharding` annotations used single-host shard over all of them — XLA
routes the collectives over ICI within a slice and DCN across slices.
Nothing else in the framework changes: train steps, samplers, and
ensembles are written against the mesh, not against a device count.

Typical pod entrypoint:

    from inverseproblemwithdiffusionmodel_tpu.parallel import (
        initialize_distributed, make_mesh, is_primary)
    initialize_distributed()          # no-op on a single host
    mesh = make_mesh()                # all global devices on the data axis
    ...
    if is_primary():                  # logging / checkpoint writes
        ...
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Bring up the cross-host JAX runtime. Returns True if a multi-process
    runtime was (or already is) active, False for plain single-process.

    With no arguments, relies on jax.distributed's cluster auto-detection
    (TPU pod metadata, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars). Safe to call more than once and safe to call
    on a single host: a runtime that cannot be formed leaves JAX in its
    normal single-process mode.
    """
    global _initialized
    # NOTE: do NOT consult jax.process_count() (or any device API) before
    # deciding whether to initialize — it instantiates the XLA backends,
    # after which jax.distributed.initialize() always raises. Use the
    # runtime's own flag to detect an already-formed cluster.
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if _initialized or already:
        _initialized = True
        return True
    # explicit opt-in only: single-chip relay backends export TPU_* metadata
    # vars too, so sniffing them would misfire — a pod launcher sets the
    # coordinator address (flag or env)
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or num_processes
    if not explicit:
        # single host, nothing to form (safe to touch backends from here on)
        return jax.process_count() > 1
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def is_primary() -> bool:
    """True on the process that should own side effects (metrics streams,
    checkpoint writes, figure rendering). Matches the reference EMA
    callback's latent rank-zero convention (pl_callbacks.py:67,92)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This process's row range of a globally-sharded batch: hosts feed
    per-process shards (jax.make_array_from_process_local_data convention);
    the global batch must divide evenly by process_count."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
