"""Exact hex-lattice rotations and reflections.

A capability the hexagonal lattice has and the rectangular one lacks:
rotation by multiples of 60 degrees is an EXACT permutation of cells (no
interpolation, no value loss).  The reference can only approximate this
through the barycentric warp; here it is a K=1 exact gather plan riding the
standard resampling engine.

Axial correspondence for the brick-wall storage (offset-0, odd rows shifted
right — see ``lattice``): ``r = i``, ``q = j - (i - (i % 2)) // 2``;
rotation by 60 degrees in axial coords is ``(q, r) -> (-r, q + r)``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import sampling

__all__ = ["hexrot60", "hexflip"]

_PLAN_CACHE: dict = {}


def _axial_of(i, j):
    return j - (i - (i % 2)) // 2, i


def _offset_of(q, r):
    return r, q + (r - (r % 2)) // 2


def _rot_axial(q, r, k):
    for _ in range(k % 6):
        q, r = -r, q + r
    return q, r


def _build_rot_plan(h: int, w: int, k: int,
                    pivot: Optional[Tuple[int, int]]) -> sampling.SamplePlan:
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    q, r = _axial_of(ii, jj)
    pi, pj = pivot if pivot is not None else (h // 2, w // 2)
    qc, rc = _axial_of(np.array(pi), np.array(pj))
    q2, r2 = _rot_axial(q - qc, r - rc, k)
    io, jo = _offset_of(q2 + qc, r2 + rc)
    io = io - io.min()
    jo = jo - jo.min()
    h1, w1 = int(io.max()) + 1, int(jo.max()) + 1
    src = np.full((h1, w1), -1, np.int64)
    src[io, jo] = (ii * w + jj).ravel().reshape(h, w)
    mask = src >= 0
    idx = np.where(mask, src, 0).astype(np.int32)
    return sampling.SamplePlan(idx[None], mask[None].astype(np.float32),
                               (h, w), (h1, w1), exact_select=True)


def hexrot60(image, k: int = 1, pivot: Optional[Tuple[int, int]] = None):
    """Rotate a hex image (..., H, W) by ``k * 60`` degrees exactly.

    Every source cell lands on exactly one output cell (values preserved
    bit-for-bit, incl. integer dtypes); cells of the output canvas outside
    the rotated support are zero.  ``pivot`` is the storage index of the
    rotation centre (default: the centre cell).  ``hexrot60(x, 6)`` is the
    identity.
    """
    import jax.numpy as jnp
    image = jnp.asarray(image)
    h, w = image.shape[-2:]
    key = (h, w, k % 6, pivot)
    if key not in _PLAN_CACHE:
        if len(_PLAN_CACHE) > 64:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = _build_rot_plan(h, w, k, pivot)
    return sampling.apply_plan_auto(image, _PLAN_CACHE[key])


def hexflip(image, axis: str = "horizontal"):
    """Exact hex-lattice mirror.

    ``"horizontal"`` (across the vertical axis) is a plain column reversal
    on brick-wall storage with an offset-parity flip absorbed as a
    half-cell translation; ``"vertical"`` reverses rows likewise.  Both are
    pure permutations.
    """
    import jax.numpy as jnp
    image = jnp.asarray(image)
    if axis == "horizontal":
        return image[..., :, ::-1]
    if axis == "vertical":
        return image[..., ::-1, :]
    raise ValueError(axis)
