"""Fused gather-interpolate resampling kernel (Pallas / Mosaic).

The TPU-native replacement slot for the reference's Numba-CUDA
``resample_on_hexagonal_grids`` kernel (``geometry.py:8-155``, SURVEY.md
section 2.3).  XLA lowers the resampling plans' large arbitrary gathers to
a scalar index loop on TPU (~13 ms for a 512^2x3 hex->rect inside a fused
program); this kernel exploits the plans' *row-band structure* instead:

Every axis-aligned resample term reads, for output row r, only source rows
``{b_r, b_r + 1}``.  So per output row the op is two (BC, W) x (W, W1)
matmuls where the right factors are weight-carrying one-hot matrices built
in-register from iota==index compares — the gather rides the MXU, the
indices never touch HBM as gather indices at all.

Scope: plans whose terms are row-separable (hex_to_rect / hexresize /
rect_to_hex / axis-aligned warps) and whose source fits VMEM; the generic
XLA path remains the fallback (``apply_plan``).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.sampling import SamplePlan, apply_plan

__all__ = ["rowsep_decompose", "apply_plan_pallas", "pallas_resample_applicable"]


def rowsep_decompose(plan: SamplePlan):
    """Decompose a plan into the row-band form.

    Returns ``(rowbase (h1,) int32, cols (2, K, h1, w1) int32,
    wts (2, K, h1, w1) float32)`` such that::

        out[c, r, :] = sum_d sum_k wts[d,k,r,:] * src[c, rowbase[r]+d, cols[d,k,r,:]]

    or None if the plan is not row-separable.
    """
    h, w = plan.src_shape
    if h < 2:
        return None
    k, h1, w1 = plan.idx.shape
    rows = plan.idx // w
    cols = plan.idx % w
    valid = plan.weights != 0
    # zero-weight entries are clamped placeholders — exclude them from the
    # band computation; they can live anywhere with weight 0
    big = np.where(valid, rows, h + 10)
    base = big.min(axis=(0, 2))                      # (h1,)
    base = np.where(base > h, 0, base)               # fully-invalid rows
    base = np.clip(base, 0, h - 2).astype(np.int64)
    delta = rows - base[None, :, None]
    if np.any(valid & ((delta < 0) | (delta > 1))):
        return None
    # keep only slots that carry any weight for the given row-part
    # (e.g. bilinear rect plans use terms {p1,p2} for d=0 and {p3,p4} for
    # d=1 — dropping the dead half halves the kernel's one-hot builds)
    per_d = []
    for d in (0, 1):
        sel = valid & (delta == d)
        c_list, w_list = [], []
        for kk in range(k):
            wk = np.where(sel[kk], plan.weights[kk], 0.0)
            if np.any(wk):
                c_list.append(np.where(sel[kk], cols[kk], 0))
                w_list.append(wk)
        per_d.append((c_list, w_list))
    kd = max(1, max(len(c) for c, _ in per_d))
    out_cols = np.zeros((2, kd, h1, w1), np.int32)
    out_wts = np.zeros((2, kd, h1, w1), np.float32)
    for d in (0, 1):
        c_list, w_list = per_d[d]
        for i, (c, wv) in enumerate(zip(c_list, w_list)):
            out_cols[d, i] = c
            out_wts[d, i] = wv
    return base.astype(np.int32), out_cols, out_wts


def pallas_resample_applicable(plan: SamplePlan, n_lead: int,
                               elem_bytes: int = 4,
                               vmem_budget: int = 8 * 2**20) -> bool:
    h, w = plan.src_shape
    return (h >= 2 and h * w * elem_bytes <= vmem_budget
            and rowsep_decompose(plan) is not None)


def _resample_kernel(rowref, colref, wref, src_ref, out_ref, *, tr, w, w1, k,
                     mdtype=jnp.float32,
                     precision=lax.Precision.HIGHEST):
    """One output-row tile: per row, two one-hot matmuls on the MXU.
    ``rowref`` is the full row-base vector (scalar-prefetched into SMEM).
    ``mdtype``: matmul operand dtype.  The one-hot build stays fully
    32-bit (the i1 mask of an i32 compare lives in (8,128) vreg tiling,
    and Mosaic cannot relayout it onto 16-bit operands, nor iota natively
    in int16); only the finished selection matrix is cast.
    ``precision``: MXU strategy for the dot.  Mosaic supports DEFAULT
    (one bf16 pass) and HIGHEST (six passes, f32 bit-parity; ``HIGH`` is
    rejected).  The dispatch ties these to the image dtype — see
    ``_apply_plan_pallas_impl``."""
    iota = lax.broadcasted_iota(jnp.int32, (w, w1), 0)
    j = pl.program_id(1)
    for r in range(tr):
        base = rowref[j * tr + r]
        acc = None
        for d in (0, 1):
            m = jnp.zeros((w, w1), jnp.float32)
            for kk in range(k):
                c = colref[0, d, kk, r, :][None, :]      # (1, w1)
                wt = wref[0, d, kk, r, :][None, :]
                m = m + jnp.where(iota == c, wt, jnp.zeros((), jnp.float32))
            # source is laid out h-major (H, 1, BC, W): the dynamic row
            # index hits the untiled leading dim, which Mosaic allows for
            # every dtype (a dynamic *sublane* index would need provable
            # 8/16 alignment and rejects packed bf16)
            srow = src_ref[base + d, 0].astype(mdtype)      # (BC, w)
            term = jnp.dot(srow, m.astype(mdtype),
                           preferred_element_type=jnp.float32,
                           precision=precision)
            acc = term if acc is None else acc + term
        out_ref[:, r, :] = acc.astype(out_ref.dtype)


def apply_plan_pallas(image, plan: SamplePlan, tile_rows: int = 8):
    """Execute a row-separable plan via the fused Pallas kernel.

    Same numerics as :func:`hygrid_tpu.ops.sampling.apply_plan` (tested);
    image shape (..., H, W), any leading dims.  Differentiable: resampling
    is linear in the image, so the VJP is the transpose scatter
    (segment-sum over the plan's indices) — a Pallas call alone has no
    autodiff rule, which would break training through resamples on TPU.
    """
    dec = rowsep_decompose(plan)
    if dec is None:
        return apply_plan(image, plan)
    return _apply_plan_pallas_ad(image, plan, tile_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _apply_plan_pallas_ad(image, plan, tile_rows):
    return _apply_plan_pallas_impl(image, plan, tile_rows)


def _apply_plan_pallas_fwd(image, plan, tile_rows):
    return _apply_plan_pallas_impl(image, plan, tile_rows), image.shape


def _apply_plan_pallas_bwd(plan, tile_rows, img_shape, g):
    h, w = plan.src_shape
    k = plan.idx.shape[0]
    lead = img_shape[:-2]
    g2 = g.reshape((-1,) + plan.out_shape)          # (BC, h1, w1)
    idx = jnp.asarray(plan.idx.reshape(-1))
    wts = jnp.asarray(plan.weights.reshape(-1))
    bc = g2.shape[0]
    gk = jnp.broadcast_to(g2.reshape(bc, 1, -1).astype(jnp.float32),
                          (bc, k, g2.shape[1] * g2.shape[2]))
    contrib = (gk * wts.reshape(1, k, -1)).reshape(bc, -1)
    dimg = jax.ops.segment_sum(contrib.T, idx, num_segments=h * w).T
    return (dimg.reshape(img_shape).astype(g.dtype),)


_apply_plan_pallas_ad.defvjp(_apply_plan_pallas_fwd, _apply_plan_pallas_bwd)


def _apply_plan_pallas_impl(image, plan: SamplePlan, tile_rows: int = 8):
    dec = rowsep_decompose(plan)
    rowbase, cols, wts = dec
    h, w = plan.src_shape
    _, k, h1, w1 = cols.shape

    image = jnp.asarray(image)
    lead = image.shape[:-2]
    bc = int(np.prod(lead)) if lead else 1
    # h-major layout: the kernel's dynamic row index then hits an untiled
    # leading dim (see _resample_kernel) — one cheap transpose per call
    src = jnp.moveaxis(image.reshape(bc, h, w), 0, 1)      # (h, bc, w)
    out_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)

    # group leading planes so one group's source slab fits VMEM; a larger
    # group raises the matmul M-dim (MXU utilisation), paid for by a raised
    # scoped-vmem limit below
    esz = image.dtype.itemsize
    budget = 8 * 2**20
    gb = max(1, min(bc, budget // max(1, h * w * esz)))
    pad_bc = (-bc) % gb
    if pad_bc:
        src = jnp.pad(src, ((0, 0), (0, pad_bc), (0, 0)))
    n_groups = (bc + pad_bc) // gb
    # 4-D (h, n_groups, gb, w): the block's last two dims (gb, w) equal the
    # array's, satisfying Mosaic's block-divisibility rule for ANY gb
    src = src.reshape(h, n_groups, gb, w)

    tr = tile_rows
    pad_h1 = (-h1) % tr
    if pad_h1:
        rowbase = np.pad(rowbase, (0, pad_h1))
        cols = np.pad(cols, ((0, 0), (0, 0), (0, pad_h1), (0, 0)))
        wts = np.pad(wts, ((0, 0), (0, 0), (0, pad_h1), (0, 0)))
    n_tiles = (h1 + pad_h1) // tr

    # precision follows the image dtype (v5e measurements, 4K-mosaic-shaped
    # plan): 16-bit float images run native bf16 at the full MXU rate
    # (123 fps); f32 images run HIGHEST (six bf16 passes, 26 fps) for bit
    # parity with the XLA gather path — DEFAULT on f32 would silently
    # introduce ~2e-3 relative error.  Callers choose speed by choosing
    # dtype (apply_plan_auto routes u8 exact-selects through bf16, which
    # is exact for 8-bit-origin samples; the viewer renders at bf16).
    if image.dtype.itemsize == 2:
        mdtype, precision = image.dtype, lax.Precision.DEFAULT
    else:
        mdtype, precision = jnp.float32, lax.Precision.HIGHEST
    kern = functools.partial(_resample_kernel, tr=tr, w=w, w1=w1, k=k,
                             mdtype=mdtype, precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 2, k, tr, w1), lambda g, j, rows: (0, 0, 0, j, 0)),
            pl.BlockSpec((1, 2, k, tr, w1), lambda g, j, rows: (0, 0, 0, j, 0)),
            pl.BlockSpec((h, 1, gb, w), lambda g, j, rows: (0, g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gb, tr, w1), lambda g, j, rows: (g, j, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bc + pad_bc, (h1 + pad_h1), w1),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(30 * 2 ** 20)),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(rowbase), jnp.asarray(cols)[None],
      jnp.asarray(wts)[None], src)
    out = out[:bc, :h1]
    return out.reshape(lead + (h1, w1))
