"""Hexagon-mosaic rasteriser (layer L5).

TPU-native replacement for the reference's OpenGL viewer
(``HexPixelArt/hexagon_mosaic_shader.py``): the GLSL fragment shader's
nearest-hex-center lookup (``hexagon_mosaic_shader.py:38-82``) is a
data-independent map from output pixel to source texel, so it becomes a
precomputed gather plan — one fused gather renders the whole frame (any
resolution, all channels) on device, instead of per-fragment GPU work behind
a GL swapchain.

Pan/zoom/hierarchy are pure functions of the view state (the reference's
mutable ``Window`` key-state deltas, ``window.py:78-123``), so interactive
viewing is: update state, re-render, blit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ["ViewState", "mosaic_plan", "render_mosaic"]


@dataclasses.dataclass(frozen=True)
class ViewState:
    """Pure view state: pan offsets in clip space, zoom scale, mosaic
    hierarchy level (the shader's ``hexmosaicSizeRatio = 2**-hierarchy``,
    ``texture.py:62``)."""

    dx: float = 0.0
    dy: float = 0.0
    scale: float = 1.0
    hierarchy: int = 0

    def pan(self, dx: float, dy: float) -> "ViewState":
        return dataclasses.replace(self, dx=self.dx + dx, dy=self.dy + dy)

    def zoom(self, factor: float) -> "ViewState":
        return dataclasses.replace(self, scale=self.scale * factor)

    def coarser(self, levels: int = 1) -> "ViewState":
        return dataclasses.replace(self, hierarchy=self.hierarchy + levels)


def mosaic_plan(tex_h: int, tex_w: int, out_h: int, out_w: int,
                even_odd_offset: int = 0, view: Optional[ViewState] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel source texel indices + validity mask.

    Faithful port of the fragment shader math
    (``hexagon_mosaic_shader.py:38-82``):

    * shader x axis = texture width, y = height; the vertex shader flips v
      (``uv = (aTex.x, 1 - aTex.y)``, line 21) which exactly cancels the
      bottom-up GL texture upload, so arrays map top-down 1:1;
    * half-cell boxes of size (TB=0.5, TR=1) * 2^-hierarchy, two diagonal
      candidate centers picked by a parity test, nearer-by-squared-distance
      wins;
    * the winning center de-skews to texel coords via integer division
      ``sx = (vx - 1 - (vy+1+offset)%2)/2 + 0.5``;
    * clamp-to-border sampling (``texture.py:48-49``) becomes a zero mask.

    Returns ``(flat_idx int32 (out_h, out_w), mask float32 (out_h, out_w))``.
    """
    view = view or ViewState()
    ratio = float(2.0 ** (-view.hierarchy))
    tb, tr = 0.5 * ratio, 1.0 * ratio

    sizex = tex_w + 0.5
    sizey = tex_h + 1.0

    jj, ii = np.meshgrid(np.arange(out_w), np.arange(out_h))
    u = (jj + 0.5) / out_w
    v = (ii + 0.5) / out_h
    # pan/zoom transform the quad in clip space; equivalently transform uv
    u = (u - 0.5) / view.scale + 0.5 + view.dx
    v = (v - 0.5) / view.scale + 0.5 + view.dy

    x = u * sizex
    y = v * sizey

    wx = np.trunc(x / tb).astype(np.int64)
    wy = np.trunc(y / tr).astype(np.int64)

    same_parity = ((wx + even_odd_offset) & 1) == (wy & 1)
    v1x = np.where(same_parity, tb * wx, tb * wx)
    v1y = np.where(same_parity, tr * wy, tr * (wy + 1))
    v2x = np.where(same_parity, tb * (wx + 1), tb * (wx + 1))
    v2y = np.where(same_parity, tr * (wy + 1), tr * wy)

    s1 = (v1x - x) ** 2 + (v1y - y) ** 2
    s2 = (v2x - x) ** 2 + (v2y - y) ** 2
    pick1 = s1 < s2
    cx = np.where(pick1, v1x, v2x)
    cy = np.where(pick1, v1y, v2y)

    vx = np.trunc(cx / 0.5).astype(np.int64)
    vy = np.trunc(cy / 1.0).astype(np.int64)

    # GLSL integer division truncates toward zero
    num = vx - 1 - (vy + 1 + even_odd_offset) % 2
    sx = np.trunc(num / 2).astype(np.float64) + 0.5
    sy = vy - 0.5

    # texture2D with unnormalised coords (sx/size.x, sy/size.y), GL_NEAREST
    # region semantics: texel index = floor(coord * size)
    tj = np.floor(sx).astype(np.int64)
    ti = np.floor(sy).astype(np.int64)
    mask = ((ti >= 0) & (ti < tex_h) & (tj >= 0) & (tj < tex_w))
    flat = (np.clip(ti, 0, tex_h - 1) * tex_w
            + np.clip(tj, 0, tex_w - 1)).astype(np.int32)
    return flat, mask.astype(np.float32)


_PLAN_CACHE: dict = {}


def render_mosaic(hex_image, out_size: Tuple[int, int],
                  even_odd_offset: int = 0, view: Optional[ViewState] = None,
                  background: float = 0.0):
    """Render a hex image (C, H, W) as a true hexagon mosaic (C, out_h, out_w).

    jit-friendly; the per-frame device work is one gather + mask multiply.
    """
    img = jnp.asarray(hex_image)
    if img.ndim == 2:
        img = img[None]
    c, h, w = img.shape[-3:]
    out_h, out_w = out_size
    key = (h, w, out_h, out_w, even_odd_offset, view)
    if key not in _PLAN_CACHE:
        if len(_PLAN_CACHE) > 64:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = mosaic_plan(h, w, out_h, out_w, even_odd_offset,
                                       view)
    flat, mask = _PLAN_CACHE[key]
    # ride the resampling engine: the mosaic plan is K=1 with a pure 0/1
    # mask, i.e. an exact-select plan — integer dtypes round-trip
    # bit-exactly (8-bit rides the full-rate bf16 Pallas path).  f32
    # frames render at bf16 sample precision (strictly above the
    # reference viewer, which samples uint8 GL textures,
    # ``texture.py:30-44``) so the 4K render stays at MXU speed.
    from ..ops.sampling import SamplePlan, apply_plan_auto
    plan = SamplePlan(flat[None], mask[None], (h, w), (out_h, out_w),
                      exact_select=True)
    rimg = (img.astype(jnp.bfloat16)
            if img.dtype == jnp.float32 else img)
    frame = apply_plan_auto(rimg, plan)
    if img.dtype == jnp.float32:
        frame = frame.astype(jnp.float32)
    if background:
        m = jnp.asarray(mask).astype(jnp.float32)
        frame = (frame.astype(jnp.float32)
                 + background * (1 - m)).astype(frame.dtype)
    return frame
