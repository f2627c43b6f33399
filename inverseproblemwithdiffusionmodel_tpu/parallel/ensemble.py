"""Sharded reconstruction ensembles.

Reconstruction quality in the reference comes from ensembles of independent
ALD chains: `--num_samples` repeats the measurement across the batch dim
(reference: scripts/acdc_SENSE_real_img.py:104) and the figure code averages
them (reference: helpers/visualizations.py:117-120, "mean of 105
reconstructions" README.md:12). On TPU the chains are rows of a batch sharded
over the mesh `data` axis; each chain folds its own PRNG key. The whole
ensemble is ONE jitted computation — XLA places per-chain work on its shard's
device and the final mean is a cross-device reduction it schedules over ICI.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .mesh import DATA_AXIS, data_sharding, replicated


def repeat_measurement(measurement: jnp.ndarray, num_samples: int,
                       batch_axis: int = 0) -> jnp.ndarray:
    """Tile a single measurement into `num_samples` ensemble rows
    (reference: acdc_SENSE_real_img.py:104 `torch.cat([measurement] * N)`)."""
    reps = [1] * measurement.ndim
    reps[batch_axis] = num_samples
    return jnp.tile(measurement, reps)


def ensemble_keys(key: jax.Array, num_samples: int) -> jax.Array:
    """Independent per-chain PRNG keys via fold_in."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(num_samples))


def shard_chain_axis(x: jnp.ndarray, mesh: Mesh, axis: int = 0
                     ) -> Tuple[jnp.ndarray, int]:
    """Pad the chain axis up to a multiple of the mesh data-axis size (edge
    rows — wasted compute, sliced off after) and shard it. Returns
    (sharded array, original chain count). This is THE way scripts place an
    ensemble on the mesh: device_put of an indivisible batch raises, and
    hand-built PartitionSpecs drift.
    """
    import numpy as np
    from .mesh import pad_to_multiple
    from jax.sharding import NamedSharding, PartitionSpec as P
    padded, n = pad_to_multiple(np.asarray(x), mesh.shape[DATA_AXIS], axis)
    spec = [None] * padded.ndim
    spec[axis] = DATA_AXIS
    return jax.device_put(jnp.asarray(padded),
                          NamedSharding(mesh, P(*spec))), n


def run_sharded_ensemble(
    sampler: Callable[..., jnp.ndarray],
    measurement: jnp.ndarray,
    num_samples: int,
    key: jax.Array,
    mesh: Optional[Mesh] = None,
    measurement_batch_axis: int = 0,
    output_batch_axis: int = 0,
) -> jnp.ndarray:
    """Run `num_samples` independent chains of `sampler(measurement, key)`
    with the chain axis sharded over the mesh's data axis.

    sampler: (measurement_batch, key) -> recon_batch; it must treat batch
    rows independently (all our ALD/MAP samplers do). Indivisible ensemble
    sizes (e.g. the README's 105 chains on 8 devices) are padded up to a
    multiple of the data axis via shard_chain_axis and the padding chains
    sliced off the result. measurement_batch_axis is the chain axis of the
    MEASUREMENT (1 for SENSE's coil-leading layout); output_batch_axis is
    the chain axis of the sampler's OUTPUT — the padding is sliced off
    there. Returns the stacked reconstructions (num_samples along
    output_batch_axis).
    """
    y = repeat_measurement(measurement, num_samples, measurement_batch_axis)
    if mesh is None:
        return sampler(y, key)
    y, n = shard_chain_axis(y, mesh, axis=measurement_batch_axis)
    key = jax.device_put(key, replicated(mesh))
    out = sampler(y, key)
    if out.shape[output_batch_axis] != n:
        out = jax.lax.slice_in_dim(out, 0, n, axis=output_batch_axis)
    return out


def ensemble_mean_std(recons: jnp.ndarray, axis: int = 0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Magnitude-domain ensemble mean and std
    (reference: helpers/visualizations.py:117-120 averages |x| over chains)."""
    mag = jnp.abs(recons) if jnp.iscomplexobj(recons) else recons
    return mag.mean(axis=axis), mag.std(axis=axis)
