"""Unified resampling engine (layer L2 core).

The reference implements near-identical sampling math four times
(``geometry_np.py`` C1-C4, ~670 LoC) and twice more in CUDA/torch backends.
Here there is ONE engine with two halves:

* **Plan** — given sample coordinates, compute gather indices and blend
  weights.  Sample coordinates are *data independent* (they depend only on
  shapes and the transform), so for static transforms the plan is computed
  once in float64 numpy at trace time and becomes jit-constant input.  This
  is the TPU-native replacement for the reference's per-channel
  ``cuda.to_device``/kernel-launch/``copy_to_host`` loop
  (``geometry.py:238-252``): on TPU the hot op is just K fused gathers + FMA
  over all channels at once.

* **Apply** — a jittable gather-and-blend.  Linear in the image, so it is
  freely differentiable and batchable (``vmap``/leading batch dims).

Both halves are ``xp``-polymorphic: calling the plan functions with
``xp=jax.numpy`` yields a fully traced on-device variant for dynamic or
differentiable sample coordinates.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .. import lattice

__all__ = [
    "SamplePlan",
    "hex_sample_plan",
    "rect_sample_plan",
    "apply_plan",
]


@dataclasses.dataclass(frozen=True, eq=False)
class SamplePlan:
    """Gather/blend recipe for one resampling op.

    Attributes:
        idx: ``(K, h1, w1)`` int32 flattened source indices (``i * W + j``),
            clamped into range.
        weights: ``(K, h1, w1)`` float32 blend weights; invalid (out-of-range)
            contributions carry weight 0, replicating the reference's
            zero-filled neighbour planes (``geometry_np.py:149-156``).
        src_shape: ``(H, W)`` of the source image.
        out_shape: ``(h1, w1)``.
        exact_select: True when K == 1 and weights are pure 0/1 masks
            (nearest modes) — lets ``apply_plan`` preserve integer dtypes.
    """

    idx: np.ndarray
    weights: np.ndarray
    src_shape: Tuple[int, int]
    out_shape: Tuple[int, int]
    exact_select: bool = False


def _finalize(idx_list, w_list, h, w, xp, exact_select=False):
    iidx = xp.stack([xp.clip(i, 0, h - 1) for i, _ in idx_list], axis=0)
    jidx = xp.stack([xp.clip(j, 0, w - 1) for _, j in idx_list], axis=0)
    flat = (iidx * w + jidx).astype(np.int32 if xp is np else "int32")
    weights = xp.stack(w_list, axis=0)
    if xp is np:
        weights = weights.astype(np.float32)
        return SamplePlan(flat, weights, (h, w), flat.shape[1:], exact_select)
    return SamplePlan(flat, weights.astype("float32"), (h, w), flat.shape[1:], exact_select)


def hex_sample_plan(x, y, h: int, w: int, method: str, xp=np) -> SamplePlan:
    """Plan for sampling a hex (brick-wall, offset-0) image at Cartesian
    points ``(x, y)``.

    Implements the triangle-pick + barycentric machinery shared by the
    reference's warp / hex->rect / hexresize (``geometry_np.py:107-187``).

    method:
        ``"linear"`` — barycentric blend over the 3 enclosing vertices.
        ``"nearest"`` — nearest vertex (reference intent; its own branch is
            broken, see ``lattice.triangle_select_nearest``).
    """
    i_, j_ = lattice.affine_index(x, y, h, w)
    i_n = lattice._trunc_int(i_, xp)
    j_n = lattice._trunc_int(j_, xp)
    i_f = i_ - i_n
    j_f = j_ - j_n

    (i1, j1), (i2, j2), (i3, j3), (i4, j4) = lattice.hex_neighbors(i_n, j_n, xp)

    def valid(i, j):
        return ((i >= 0) & (j >= 0) & (i < h) & (j < w))

    flag, p1, p2, p3 = lattice.triangle_vertices(i_n, j_n, i_f, j_f, h, w, xp)

    # vertex 2 of the triangle is neighbour 2 (next row) in the upper
    # triangle, neighbour 3 (same row) in the lower (geometry_np.py:154-155)
    i2s = xp.where(flag, i2, i3)
    j2s = xp.where(flag, j2, j3)
    v1 = valid(i1, j1)
    v2 = xp.where(flag, valid(i2, j2), valid(i3, j3))
    v3 = valid(i4, j4)

    fdt = x.dtype
    if method == "linear":
        a, b, g = lattice.triangle_weights_linear(x, y, p1, p2, p3, xp)
        w1_ = a * v1.astype(fdt)
        w2_ = b * v2.astype(fdt)
        w3_ = g * v3.astype(fdt)
        return _finalize([(i1, j1), (i2s, j2s), (i4, j4)], [w1_, w2_, w3_], h, w, xp)
    if method == "nearest":
        sel = lattice.triangle_select_nearest(x, y, p1, p2, p3, xp)
        ii = xp.where(sel == 0, i1, xp.where(sel == 1, i2s, i4))
        jj = xp.where(sel == 0, j1, xp.where(sel == 1, j2s, j4))
        vv = xp.where(sel == 0, v1, xp.where(sel == 1, v2, v3))
        return _finalize([(ii, jj)], [vv.astype(fdt)], h, w, xp, exact_select=True)
    if method == "bilinear":
        # Method 2 of the reference's interpolation enum — declared at
        # ``geometry_np.py:15`` but never implemented in the numpy backend;
        # the CUDA kernel sketches the evident intent (``geometry.py:52-86``):
        # a two-stage lerp over the AFFINE parallelogram spanned by all 4
        # de-skewed neighbours, weighted by the affine fractional parts.
        # DIVERGENCE (fixed bug): the kernel reuses the j_n-edge term in
        # both halves of the lerp (``geometry.py:77-84`` — t3/t4 are loaded
        # and never used), collapsing bilinear to a 1-D lerp; this
        # implementation completes the intent:
        #   out = (1-j_f) * [(1-i_f) t1 + i_f t2] + j_f * [(1-i_f) t3 + i_f t4]
        vall = [valid(i1, j1), valid(i2, j2), valid(i3, j3), valid(i4, j4)]
        ws = [(1 - i_f) * (1 - j_f), i_f * (1 - j_f),
              (1 - i_f) * j_f, i_f * j_f]
        return _finalize(
            [(i1, j1), (i2, j2), (i3, j3), (i4, j4)],
            [wk * vk.astype(fdt) for wk, vk in zip(ws, vall)], h, w, xp)
    raise ValueError(f"unsupported hex sampling method {method!r}")


def rect_sample_plan(x, y, h: int, w: int, method: str, xp=np,
                     nearest_metric: str = "reference") -> SamplePlan:
    """Plan for sampling a rectangular image at Cartesian points ``(x, y)``
    (image-centered coordinates).

    Mirrors ``rect_to_hex_resample``'s 4-neighbour machinery
    (``geometry_np.py:437-517``): affine index is the plain pixel index,
    ``nearest`` is argmin over the 4 corners in p1..p4 order, ``bilinear``
    is the two-stage lerp of lines 515-517.

    nearest_metric:
        ``"reference"`` (default) — replicate the reference's latent bug: the
        distance compares *centered* sample coordinates against *integer
        index* neighbour coordinates (``geometry_np.py:489-502``), mixing
        frames.  For any image with H, W >= 3 this degenerates to "always
        pick the truncated cell (i_n, j_n)".
        ``"euclidean"`` — the evident intent: true nearest neighbour in a
        consistent frame (documented divergence toggle).
    """
    i_ = x + (h - 1) * 0.5
    j_ = y + (w - 1) * 0.5
    i_n = lattice._trunc_int(i_, xp)
    j_n = lattice._trunc_int(j_, xp)
    i_f = i_ - i_n
    j_f = j_ - j_n

    nbrs = [(i_n, j_n), (i_n, j_n + 1), (i_n + 1, j_n), (i_n + 1, j_n + 1)]

    def valid(i, j):
        return ((i >= 0) & (j >= 0) & (i < h) & (j < w))

    vs = [valid(i, j) for i, j in nbrs]
    fdt = x.dtype

    if method == "nearest":
        if nearest_metric == "reference":
            sx, sy = x, y  # mixed-frame distances, see docstring
        elif nearest_metric == "euclidean":
            sx, sy = i_, j_
        else:
            raise ValueError(f"unknown nearest_metric {nearest_metric!r}")
        ds = [ (sx - i) ** 2 + (sy - j) ** 2 for i, j in nbrs ]
        sel = xp.argmin(xp.stack(ds, axis=0), axis=0)
        ii = nbrs[0][0] + (sel >= 2).astype(i_n.dtype)
        jj = nbrs[0][1] + (sel % 2).astype(j_n.dtype)
        vv = xp.where(sel == 0, vs[0], xp.where(sel == 1, vs[1],
                      xp.where(sel == 2, vs[2], vs[3])))
        return _finalize([(ii, jj)], [vv.astype(fdt)], h, w, xp, exact_select=True)
    if method == "bilinear":
        # t1 = i_f*p3 + (1-i_f)*p1 ; t2 = i_f*p4 + (1-i_f)*p2
        # out = j_f*t2 + (1-j_f)*t1          (geometry_np.py:515-517)
        w1_ = (1 - j_f) * (1 - i_f) * vs[0].astype(fdt)
        w2_ = j_f * (1 - i_f) * vs[1].astype(fdt)
        w3_ = (1 - j_f) * i_f * vs[2].astype(fdt)
        w4_ = j_f * i_f * vs[3].astype(fdt)
        return _finalize(nbrs, [w1_, w2_, w3_, w4_], h, w, xp)
    raise ValueError(f"unsupported rect sampling method {method!r}")


RESAMPLE_BACKEND = "auto"
"""Resample execution backend: "auto" (Pallas fused kernel on TPU when the
plan is row-separable and the source fits VMEM, XLA otherwise), "xla", or
"pallas" (force)."""


def set_resample_backend(name: str) -> None:
    global RESAMPLE_BACKEND
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(name)
    RESAMPLE_BACKEND = name


def apply_plan_auto(image, plan: "SamplePlan"):
    """Backend-dispatching plan execution (see RESAMPLE_BACKEND).

    XLA lowers the plans' large arbitrary gathers to a scalar loop on TPU;
    the Pallas kernel (kernels/resample_pallas.py) turns row-separable
    plans into MXU one-hot matmuls instead (~30x faster on big frames).
    """
    import jax as _jax
    image = jnp.asarray(image)
    if RESAMPLE_BACKEND == "xla":
        return apply_plan(image, plan)
    from ..kernels.resample_pallas import (apply_plan_pallas,
                                          pallas_resample_applicable)
    lead = image.shape[:-2]
    if all(isinstance(d, int) for d in lead):
        n_lead = int(np.prod(lead)) if lead else 1
    else:
        # symbolic dims (jax.export shape polymorphism): the Pallas grid
        # needs a concrete lead count, so those exports ride the XLA path
        n_lead = None
    floaty = jnp.issubdtype(image.dtype, jnp.floating)
    if RESAMPLE_BACKEND == "pallas":
        return apply_plan_pallas(image, plan)
    if (n_lead is not None and _jax.default_backend() == "tpu"
            and pallas_resample_applicable(plan, n_lead,
                                           image.dtype.itemsize)):
        if floaty:
            return apply_plan_pallas(image, plan)
        if plan.exact_select and image.dtype.itemsize == 1:
            # 8-bit integers are exactly representable in bf16, so the
            # full-MXU-rate bf16 selection path round-trips them bit-
            # exactly; wider int types keep the XLA path below (also
            # exact, via 0/1-mask multiply in the native dtype)
            out = apply_plan_pallas(image.astype(jnp.bfloat16), plan)
            return out.astype(image.dtype)
    return apply_plan(image, plan)


def apply_plan(image, plan: SamplePlan):
    """Execute a :class:`SamplePlan` on an image of shape ``(..., H, W)``.

    Pure jnp — jit/vmap/grad friendly; gathers all channels (and any leading
    batch dims) in one fused op.
    """
    h, w = plan.src_shape
    if image.shape[-2:] != (h, w):
        raise ValueError(f"image spatial shape {image.shape[-2:]} != plan source {plan.src_shape}")
    flat = image.reshape(image.shape[:-2] + (h * w,))
    idx = jnp.asarray(plan.idx)
    taken = flat[..., idx.reshape(-1)]
    taken = taken.reshape(image.shape[:-2] + plan.idx.shape)  # (..., K, h1, w1)
    if plan.exact_select:
        # single selected value per output cell: multiply by the 0/1 mask in
        # the image dtype so integer inputs round-trip bit-exactly
        mask = jnp.asarray(plan.weights[0])
        out = taken[..., 0, :, :]
        return out * mask.astype(out.dtype)
    weights = jnp.asarray(plan.weights)
    acc_dtype = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    return jnp.sum(taken.astype(acc_dtype) * weights.astype(acc_dtype), axis=-3)
