"""Explicit spatial sharding: shard_map halo exchange over image rows.

This implements — distributed — what the reference only sketched as the
``IMAGE.Tiles()`` stub ("2000x2000 tiling ... streaming", declared and
``pass``-ed at ``Image.py:81-88``): processing rasters whose rows are
partitioned across TPU chips, with boundary rows exchanged over ICI via
``jax.lax.ppermute`` instead of materialising the full image anywhere.

Two routes exist for spatially-sharded convs:

* implicit — jit with a ``("dp", ..., "sp", ...)`` sharding and let XLA's
  SPMD partitioner insert the halo collectives (good default);
* explicit (this module) — ``shard_map`` + ppermute, needed when composing
  with hand-written Pallas kernels or when the halo pattern must be
  controlled (e.g. parity-preserving hex halos).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..nn import functional as F

__all__ = ["halo_exchange", "sharded_hex_conv2d", "sharded_hex_conv2d_fn"]


def halo_exchange(x, lo: int, hi: int, axis_name: str, axis: int = -2):
    """Extend each shard's rows with ``lo`` rows from the previous device and
    ``hi`` rows from the next, zero-filled at the global edges.

    Inside shard_map over ``axis_name``; x is the per-device block.
    Communication is two ``ppermute`` rounds over ICI (neighbours only).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    axis = axis % x.ndim

    def take(a, sl):
        ix = [slice(None)] * a.ndim
        ix[axis] = sl
        return a[tuple(ix)]

    parts = [x]
    if lo > 0:
        # previous device's bottom `lo` rows -> our top
        from_prev = jax.lax.ppermute(
            take(x, slice(x.shape[axis] - lo, None)),
            axis_name, [(i, i + 1) for i in range(n - 1)])
        top = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
        parts.insert(0, top)
    if hi > 0:
        from_next = jax.lax.ppermute(
            take(x, slice(0, hi)),
            axis_name, [(i + 1, i) for i in range(n - 1)])
        bot = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
        parts.append(bot)
    return jnp.concatenate(parts, axis=axis)


def sharded_hex_conv2d_fn(kernel, bias=None, *, even_odd_offset: int = 0,
                          radius: int, axis_name: str = "sp",
                          impl: str = "direct"):
    """Per-shard body of a row-sharded 'same' hex conv (stride/dilation 1).

    Each device holds an even-height contiguous row block of the global
    image (even so every block starts at the same row parity).  Halo rows
    ride ICI; width padding is local; the parity handed to the conv accounts
    for the ``radius - 1`` halo rows prepended to each block.
    """
    p = radius - 1

    def body(x):
        x = halo_exchange(x, p, p, axis_name) if p else x
        x = F.pad2d(x, (p, p, 0, 0))  # width-only local padding
        return F.hex_conv2d(
            x, kernel, bias, even_odd_offset=(even_odd_offset + p) % 2,
            radius=radius, stride=1, padding=0, impl=impl)

    return body


def sharded_hex_conv2d(x, kernel, mesh: Mesh, bias=None, *,
                       even_odd_offset: int = 0, radius: int,
                       axis_name: str = "sp", impl: str = "direct"):
    """Row-sharded 'same' hex convolution over a mesh axis.

    Equivalent to ``hex_conv2d(x, kernel, padding=radius-1)`` on the
    unsharded image (tested), with x's H dimension sharded over
    ``axis_name``.  Requires per-device block height to be even.
    """
    n = mesh.shape[axis_name]
    h = x.shape[-2]
    if h % n or (h // n) % 2:
        raise ValueError(
            f"global height {h} must split into even blocks over "
            f"{axis_name}={n}")
    spec = P(None, None, axis_name, None)
    body = sharded_hex_conv2d_fn(kernel, bias, even_odd_offset=even_odd_offset,
                                 radius=radius, axis_name=axis_name, impl=impl)
    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
