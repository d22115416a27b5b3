"""Streaming tiled resampling for rasters larger than device memory.

Implements (for real) the reference's ``IMAGE.Tiles`` stub
(``Image.py:81-88``: "tile 2000x2000 ... stream ... not implemented").

Because every resample is a data-independent gather plan
(:mod:`hygrid_tpu.ops.sampling`), a row-tile of the OUTPUT needs only the
contiguous row-band of the INPUT its indices touch.  The input can therefore
stay in host RAM (numpy / np.memmap); only slim bands ship to HBM per tile.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from . import sampling, geometry
from .. import lattice

__all__ = ["tiled_resample", "tiled_rect_to_hex", "tiled_hexresize"]


def _tiled_apply(plan: sampling.SamplePlan, image: np.ndarray,
                 tile_rows: int) -> np.ndarray:
    h, w = plan.src_shape
    h1, w1 = plan.out_shape
    out_tiles = []
    for r0 in range(0, h1, tile_rows):
        r1 = min(r0 + tile_rows, h1)
        idx = plan.idx[:, r0:r1]
        rows = idx // w
        lo, hi = int(rows.min()), int(rows.max())
        sub = sampling.SamplePlan(
            idx - lo * w, plan.weights[:, r0:r1], (hi - lo + 1, w),
            (r1 - r0, w1), plan.exact_select)
        band = jnp.asarray(image[..., lo:hi + 1, :])
        out_tiles.append(np.asarray(sampling.apply_plan(band, sub)))
    return np.concatenate(out_tiles, axis=-2)


def tiled_rect_to_hex(image, hex_dsize: Tuple[int, int],
                      interpolation: str = "bilinear",
                      tile_rows: int = 2048,
                      nearest_metric: str = "reference") -> np.ndarray:
    """rect -> hex for host-resident giant rasters, streamed in output-row
    tiles.  Identical numerics to
    :func:`hygrid_tpu.ops.geometry.rect_to_hex_resample` (tested)."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[None]
    h, w = image.shape[-2:]
    h1, w1 = hex_dsize
    gx, gy = geometry._linspace_grid(
        lattice.corner_box("rect_source", h, w), h1, w1)
    plan = sampling.rect_sample_plan(gx, gy, h, w, interpolation,
                                     nearest_metric=nearest_metric)
    return _tiled_apply(plan, image, tile_rows)


def tiled_hexresize(image, dsize: Tuple[int, int],
                    interpolation: str = "linear",
                    tile_rows: int = 2048) -> np.ndarray:
    """hex -> hex resize for giant rasters, streamed in output-row tiles."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[None]
    h, w = image.shape[-2:]
    h1, w1 = dsize
    gx, gy = geometry._linspace_grid(
        lattice.corner_box("hexresize", h, w), h1, w1)
    plan = sampling.hex_sample_plan(gx, gy, h, w, interpolation)
    return _tiled_apply(plan, image, tile_rows)


def tiled_resample(image, kind: str, dsize: Tuple[int, int],
                   interpolation: Optional[str] = None,
                   tile_rows: int = 2048) -> np.ndarray:
    """Dispatch by kind: 'rect_to_hex' | 'hexresize' | 'hex_to_rect'."""
    if kind == "rect_to_hex":
        return tiled_rect_to_hex(image, dsize, interpolation or "bilinear",
                                 tile_rows)
    if kind == "hexresize":
        return tiled_hexresize(image, dsize, interpolation or "linear",
                               tile_rows)
    if kind == "hex_to_rect":
        image = np.asarray(image)
        if image.ndim == 2:
            image = image[None]
        h, w = image.shape[-2:]
        h1, w1 = dsize
        gx, gy = geometry._linspace_grid(
            lattice.corner_box("hex_to_rect", h, w), h1, w1)
        plan = sampling.hex_sample_plan(gx, gy, h, w,
                                        interpolation or "linear")
        return _tiled_apply(plan, image, tile_rows)
    raise ValueError(f"unknown kind {kind!r}")
