"""Device-mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.7): its only
parallelism is single-process `torch.nn.DataParallel`
(reference: models/utils.py:93) and ensembles as batch rows
(reference: scripts/acdc_SENSE_real_img.py:104). The TPU-native equivalent is
a `jax.sharding.Mesh` with a `data` axis for batch/ensemble sharding and a
(usually trivial) `model` axis reserved for tensor parallelism; XLA inserts
the ICI collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    By default all devices go on the data axis — correct for these model
    sizes (1e7–1e8 params; the reference's ensembles and DP training are
    embarrassingly parallel over the batch axis).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(
                f"n_model={n_model} does not divide the {len(devices)} "
                f"available devices; pass n_data explicitly to use a "
                f"subset deliberately")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch / ensemble chains) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, sigma ladders, masks...)."""
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a pytree of batched arrays with axis 0 sharded over `data`."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), x)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def tp_sharding(mesh: Mesh, leaf, min_size: int = 4096) -> NamedSharding:
    """Tensor-parallel sharding rule for one parameter/optimizer leaf.

    Shards the LAST axis (conv HWIO / dense IO output channels) over the
    `model` mesh axis when the leaf is big enough and divisible; everything
    else (biases, norm scales, scalars) stays replicated. GSPMD then
    propagates the channel sharding through the network and inserts the
    ICI collectives (all-gather on channel contractions) — the TPU-native
    form of tensor parallelism, vs the reference's single-device
    `torch.nn.DataParallel` (models/utils.py:93).
    """
    n_model = mesh.shape[MODEL_AXIS]
    if (n_model > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2
            and leaf.size >= min_size and leaf.shape[-1] % n_model == 0):
        spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_tp(tree, mesh: Mesh, min_size: int = 4096):
    """Place a params/TrainState pytree tensor-parallel over the mesh
    `model` axis (see `tp_sharding`; optimizer moments and EMA copies have
    param shapes, so one rule shards them all consistently)."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, tp_sharding(mesh, a, min_size)), tree)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis to a multiple (so a batch shards evenly); returns (padded, n)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n
