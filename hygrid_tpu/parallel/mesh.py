"""Device-mesh helpers (the framework's distributed-communication layer).

The reference has no multi-device story at all (single hard-coded CUDA
device, ``geometry_torch.py:27``, ``geometry.py:348`` — SURVEY.md section
2.4).  On TPU, parallelism is declarative: build a
``jax.sharding.Mesh`` over ICI, annotate array shardings, and let XLA insert
the collectives.  These helpers standardise the axis vocabulary used across
the framework:

* ``"dp"`` — data parallel (batch axis)
* ``"sp"`` — spatial parallel (image-row axis; XLA auto-inserts halo
  exchanges for convs, or use :mod:`.spatial` for explicit shard_map halos)
* ``"tp"`` — tensor parallel (channel axis of conv kernels / dense layers)
* ``"pp"`` — pipeline parallel (conv-stack layer groups staged over devices;
  see :mod:`.pipeline`)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec

__all__ = ["P", "create_mesh", "shard_batch", "replicate", "batch_spec",
           "spatial_spec"]


def create_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a named mesh, e.g. ``create_mesh({"dp": 4, "sp": 2})``.

    Uses ``mesh_utils.create_device_mesh`` so the axis order maps onto
    physical ICI topology when running on real slices.
    """
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices[:n])
    return Mesh(dev_array, names)


def batch_spec(mesh: Mesh, ndim: int = 4, axis: str = "dp") -> P:
    """PartitionSpec sharding the leading (batch) dim of an ndim array."""
    return P(*((axis,) + (None,) * (ndim - 1)))


def spatial_spec(mesh: Mesh, ndim: int = 4, batch_axis: str = "dp",
                 row_axis: str = "sp") -> P:
    """Shard batch over dp and image rows over sp for (B, C, H, W)."""
    spec = [None] * ndim
    spec[0] = batch_axis
    spec[-2] = row_axis
    return P(*spec)


def shard_batch(x, mesh: Mesh, spec: Optional[P] = None):
    """Device-put an array (or pytree) with the given spec (default:
    batch-sharded over 'dp')."""
    def put(a):
        s = spec if spec is not None else batch_spec(mesh, np.ndim(a))
        return jax.device_put(a, NamedSharding(mesh, s))
    return jax.tree_util.tree_map(put, x)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
