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

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.sampling import SamplePlan, apply_plan

__all__ = ["rowsep_decompose", "apply_plan_pallas",
           "pallas_resample_applicable", "kernel_cost", "LaunchGeometry"]


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
    invalid = base > h                               # fully-invalid rows:
    if invalid.all():
        base = np.zeros_like(base)
    elif invalid.any():
        # forward/backward-fill from valid neighbours so the banded
        # kernel's per-tile row spans stay tight (any in-range value is
        # correct — these rows carry only zero weights)
        idxs = np.arange(base.shape[0])
        ffill = np.maximum.accumulate(np.where(~invalid, idxs, -1))
        rev = np.where(~invalid[::-1], idxs[::-1], 2 * base.shape[0])
        bfill = np.minimum.accumulate(rev)[::-1]
        base = base[np.where(ffill >= 0, ffill, bfill)]
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


_ROWSEP_CACHE: dict = {}
_ROWSEP_CACHE_MAX_BYTES = 1 << 30  # 1 GB of pinned host RAM, at most


def _rowsep_cache_bytes() -> int:
    return sum((0 if d is None else sum(a.nbytes for a in d))
               for d in _ROWSEP_CACHE.values())


def rowsep_decompose_cached(plan: SamplePlan):
    """Memoized :func:`rowsep_decompose` — the decomposition is a full
    O(K*h1*w1) float64 numpy pass and is needed by the applicability
    check, the launcher guard AND the launch geometry of every traced
    resample; computing it once per plan cuts trace time and peak host
    memory ~3x on 4K plans.  Keyed by ``id(plan)`` with a weakref
    finalizer (SamplePlan holds numpy arrays and is not hashable).

    Capped by TOTAL bytes, not entry count: geometry-level plan caches keep
    plans (and hence these entries) alive indefinitely, and one 4K
    decomposition is ~0.5 GB — oldest entries are evicted once the cache
    exceeds ``_ROWSEP_CACHE_MAX_BYTES`` (the just-inserted entry survives;
    its caller holds the reference either way)."""
    import weakref
    key = id(plan)
    if key in _ROWSEP_CACHE:
        return _ROWSEP_CACHE[key]
    dec = rowsep_decompose(plan)
    _ROWSEP_CACHE[key] = dec
    weakref.finalize(plan, _ROWSEP_CACHE.pop, key, None)
    while len(_ROWSEP_CACHE) > 1 and (
            len(_ROWSEP_CACHE) > 16
            or _rowsep_cache_bytes() > _ROWSEP_CACHE_MAX_BYTES):
        oldest = next(iter(_ROWSEP_CACHE))
        if oldest == key:
            break
        _ROWSEP_CACHE.pop(oldest)
    return dec


def _band_height(rowbase: np.ndarray, h: int, tile_rows: int):
    """Per-tile source band starts + the static band height covering every
    tile's row span (rows used by tile j are [min base, max base + 1])."""
    h1 = rowbase.shape[0]
    n_tiles = -(-h1 // tile_rows)
    lo = np.empty(n_tiles, np.int32)
    span = 0
    for j in range(n_tiles):
        chunk = rowbase[j * tile_rows:(j + 1) * tile_rows]
        lo[j] = int(chunk.min())
        span = max(span, int(chunk.max()) + 2 - lo[j])
    band = min(h, -(-span // 8) * 8)                # sublane-align the buffer
    lo = np.minimum(lo, max(0, h - band)).astype(np.int32)
    return lo, band


def pallas_resample_applicable(plan: SamplePlan, n_lead: int,
                               elem_bytes: int = 4,
                               vmem_budget: int = 8 * 2**20,
                               tile_rows: int = 8) -> bool:
    """Row-separable plans ride the fused kernel.  Sources beyond the VMEM
    budget use the banded kernel (double-buffered row-band DMA from HBM),
    which needs only the widest per-tile row band resident — it bails only
    for extreme downsampling ratios where one output tile spans most of the
    source (then the plan falls back to the XLA gather)."""
    h, w = plan.src_shape
    if h < 2:
        return False
    dec = rowsep_decompose_cached(plan)
    if dec is None:
        return False
    from .resample_shift import shift_prefers
    if shift_prefers(plan, elem_bytes):
        return True         # rides the shift executor's full path
    if h * w * elem_bytes <= vmem_budget:
        return True
    _, band = _band_height(dec[0], h, tile_rows)
    sub = max(1, 32 // elem_bytes)      # minimum sublane-aligned group
    return 2 * band * sub * w * elem_bytes <= 2 * vmem_budget


def _col_bands(cols, wts, w, w1):
    """Column-band decomposition (the column analogue of the row bands):
    for output-column tiles of width ``cw``, every source column any output
    column in the tile reads lies in a 128-aligned band
    ``[clo[t], clo[t] + cb)``.  Shrinks the one-hot selection matrix from
    (w, w1) — quadratic in image width, 56 MB at 4K — to (cb, cw), and cuts
    the m-build VPU work and matmul K-dim by ~w/cb.

    Returns ``(cw, clo (n_ctiles,) int32, cb, cols_rebased)`` or None when
    banding does not pay (cb would exceed w/2).
    """
    valid = wts != 0
    big = np.where(valid, cols, np.iinfo(np.int32).max)
    small = np.where(valid, cols, -1)
    for cw in (512, 256, 128):
        n_ct = -(-w1 // cw)
        if n_ct <= 1:
            continue
        clo = np.zeros(n_ct, np.int64)
        cb = 0
        for t in range(n_ct):
            sl = big[..., t * cw:(t + 1) * cw]
            sh = small[..., t * cw:(t + 1) * cw]
            lo = int(sl.min()) if sl.size else 0
            hi = int(sh.max()) if sh.size else -1
            if hi < 0:                       # tile reads nothing valid
                lo, hi = 0, 0
            lo = (lo // 128) * 128
            clo[t] = lo
            cb = max(cb, hi + 1 - lo)
        cb = -(-cb // 128) * 128
        if cb > w // 2 or cb * cw * 4 > 2 * 2**20:
            continue
        # clamp starts so the band stays inside the 128-padded source
        w_pad = -(-w // 128) * 128
        clo = np.minimum(clo, w_pad - cb)
        reb = cols - clo[np.minimum(np.arange(w1) // cw, n_ct - 1)][
            None, None, None, :]
        return cw, clo.astype(np.int32), int(cb), reb.astype(np.int32)
    return None


def _tile_body(rowref, rowlo, colloref, colref, wref, read_row, out_ref, *,
               tr, cb, cw, k, mdtype, precision, col_banded, d_slots):
    """Shared per-tile compute: build the (cb, cw) weight-carrying one-hot
    selection matrix in-register from iota==index compares and gather via
    MXU matmuls.  The one-hot build stays fully 32-bit (the i1 mask of an
    i32 compare lives in (8,128) vreg tiling, and Mosaic cannot relayout
    it onto 16-bit operands); only the finished matrix is cast.
    ``precision``: Mosaic supports DEFAULT (one bf16 pass) and HIGHEST
    (six passes, f32 bit-parity); the dispatch ties these to the image
    dtype — see ``_apply_plan_pallas_impl``.  ``d_slots``: only row-parts
    that carry any weight are built and matmul'd (an exact-select plan has
    a single live part — half the work)."""
    j = pl.program_id(1)
    t = pl.program_id(2)
    iota = lax.broadcasted_iota(jnp.int32, (cb, cw), 0)
    lo = rowlo[j]
    clo = pl.multiple_of(colloref[t], 128) if col_banded else 0
    for r in range(tr):
        base = rowref[j * tr + r] - lo
        acc = None
        for d in d_slots:
            m = jnp.zeros((cb, cw), jnp.float32)
            for kk in range(k):
                # cols ship int16, weights in the matmul dtype (see impl);
                # upcast the small (1, cw) vectors at build time
                c = colref[0, d, kk, r, :][None, :].astype(jnp.int32)
                wt = wref[0, d, kk, r, :][None, :].astype(jnp.float32)
                m = m + jnp.where(iota == c, wt, jnp.zeros((), jnp.float32))
            srow = read_row(base + d, clo)               # (gb, cb)
            term = jnp.dot(srow.astype(mdtype), m.astype(mdtype),
                           preferred_element_type=jnp.float32,
                           precision=precision)
            acc = term if acc is None else acc + term
        out_ref[:, r, :] = acc.astype(out_ref.dtype)


def _phased_build(colref, wref, mscratch, *, n_phases, cb, cw, k, mdtype,
                  d_slots):
    """Build every phase's selection matrix once into VMEM scratch
    ``mscratch (n_phases, n_d, cb, cw)``; rows then index it dynamically
    (untiled leading dims).  Runs at the first row tile of each column
    tile — the per-row VPU build cost drops by ~h1/n_phases."""
    iota = lax.broadcasted_iota(jnp.int32, (cb, cw), 0)
    for ph in range(n_phases):
        for di, d in enumerate(d_slots):
            m = jnp.zeros((cb, cw), jnp.float32)
            for kk in range(k):
                c = colref[ph, d, kk, :][None, :].astype(jnp.int32)
                wt = wref[ph, d, kk, :][None, :].astype(jnp.float32)
                m = m + jnp.where(iota == c, wt, jnp.zeros((), jnp.float32))
            mscratch[ph, di] = m.astype(mdtype)


def _phased_rows(rowref, phref, lo, read_row, mscratch, out_ref, *, j, tr,
                 mdtype, precision, d_slots):
    for r in range(tr):
        row = j * tr + r
        base = rowref[row] - lo
        ph = phref[row]
        acc = None
        for di, d in enumerate(d_slots):
            srow = read_row(base + d)                    # (gb, cb)
            term = jnp.dot(srow.astype(mdtype), mscratch[ph, di],
                           preferred_element_type=jnp.float32,
                           precision=precision)
            acc = term if acc is None else acc + term
        out_ref[:, r, :] = acc.astype(out_ref.dtype)


def _resample_kernel_phased(rowref, phref, rowlo, colloref, colref, wref,
                            src_ref, out_ref, mscratch, *, tr, cb, cw, k,
                            n_phases, mdtype, precision, col_banded,
                            d_slots):
    """Phase-cached full-source kernel.  Grid is (groups, column tiles,
    row tiles) — row tiles innermost — so the phase matrices are built once
    per (group, column tile) and reused across every row tile."""
    t = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        _phased_build(colref, wref, mscratch, n_phases=n_phases, cb=cb,
                      cw=cw, k=k, mdtype=mdtype, d_slots=d_slots)

    clo = pl.multiple_of(colloref[t], 128) if col_banded else 0

    def read_row(idx):
        if col_banded:
            return src_ref[idx, 0, :, pl.ds(clo, cb)]
        return src_ref[idx, 0]
    _phased_rows(rowref, phref, rowlo[j], read_row, mscratch, out_ref,
                 j=j, tr=tr, mdtype=mdtype, precision=precision,
                 d_slots=d_slots)


def _resample_kernel_phased_banded(rowref, phref, rowlo, colloref, colref,
                                   wref, src_any, out_ref, mscratch,
                                   band_buf, sems, *, tr, cb, cw, k,
                                   n_phases, band, n_tiles, mdtype,
                                   precision, col_banded, d_slots):
    """Phase-cached banded kernel: double-buffered row-band DMA as in
    ``_resample_kernel_banded``, but (a) phases are built once per
    (group, column tile) and (b) the DMA fetches only the column band
    ``[collo[t], collo[t]+cb)`` — n_ctiles x less traffic than full-width
    bands under the reordered grid."""
    g = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    clo = pl.multiple_of(colloref[t], 128) if col_banded else 0

    def band_dma(tile, slot):
        src = src_any.at[pl.ds(rowlo[tile], band), g]
        dst = band_buf.at[slot]
        if col_banded:
            src = src_any.at[pl.ds(rowlo[tile], band), g, :,
                             pl.ds(clo, cb)]
        return pltpu.make_async_copy(src, dst, sems.at[slot])

    @pl.when(j == 0)
    def _():
        band_dma(0, 0).start()
        _phased_build(colref, wref, mscratch, n_phases=n_phases, cb=cb,
                      cw=cw, k=k, mdtype=mdtype, d_slots=d_slots)

    @pl.when(j + 1 < n_tiles)
    def _():
        band_dma(j + 1, (j + 1) % 2).start()

    band_dma(j, j % 2).wait()
    slot = j % 2

    def read_row(idx):
        return band_buf[slot, idx]
    _phased_rows(rowref, phref, rowlo[j], read_row, mscratch, out_ref,
                 j=j, tr=tr, mdtype=mdtype, precision=precision,
                 d_slots=d_slots)


def _resample_kernel(rowref, rowlo, colloref, colref, wref, src_ref, out_ref,
                     *, tr, cb, cw, k, mdtype, precision, col_banded,
                     d_slots):
    """Full-source kernel: the (h, 1, gb, w) source block sits in VMEM; the
    dynamic row index hits the untiled leading dim, which Mosaic allows
    for every dtype (a dynamic *sublane* index would need provable 8/16
    alignment and rejects packed bf16)."""
    def read_row(idx, clo):
        if col_banded:
            return src_ref[idx, 0, :, pl.ds(clo, cb)]
        return src_ref[idx, 0]
    _tile_body(rowref, rowlo, colloref, colref, wref, read_row, out_ref,
               tr=tr, cb=cb, cw=cw, k=k, mdtype=mdtype, precision=precision,
               col_banded=col_banded, d_slots=d_slots)


def _resample_kernel_banded(rowref, rowlo, colloref, colref, wref, src_any,
                            out_ref, band_buf, sems, *, tr, cb, cw, k, band,
                            n_tiles, mdtype, precision, col_banded, d_slots):
    """Row-banded variant for sources that do not fit VMEM: the source
    stays in HBM (memory_space=ANY); each row tile DMAs only its source
    row band [rowlo[j], rowlo[j] + band) into a double-buffered VMEM
    scratch, prefetching tile j+1's band while computing tile j.  This is
    the TPU equivalent of the reference CUDA kernel's any-size reach
    (per-thread HBM gathers, ``geometry.py:8-155``) — but the loads stay
    bulk DMAs and the math stays on the MXU."""
    g = pl.program_id(0)
    j = pl.program_id(1)
    t = pl.program_id(2)

    def band_dma(tile, slot):
        return pltpu.make_async_copy(
            src_any.at[pl.ds(rowlo[tile], band), g],
            band_buf.at[slot], sems.at[slot])

    @pl.when((j == 0) & (t == 0))
    def _():
        band_dma(0, 0).start()

    @pl.when((t == 0) & (j + 1 < n_tiles))
    def _():
        band_dma(j + 1, (j + 1) % 2).start()

    @pl.when(t == 0)
    def _():
        band_dma(j, j % 2).wait()

    slot = j % 2

    def read_row(idx, clo):
        if col_banded:
            return band_buf[slot, idx, :, pl.ds(clo, cb)]
        return band_buf[slot, idx]
    _tile_body(rowref, rowlo, colloref, colref, wref, read_row, out_ref,
               tr=tr, cb=cb, cw=cw, k=k, mdtype=mdtype, precision=precision,
               col_banded=col_banded, d_slots=d_slots)


def apply_plan_pallas(image, plan: SamplePlan, tile_rows: int = 8,
                      force_banded: bool = False):
    """Execute a row-separable plan via the fused Pallas kernel.

    Same numerics as :func:`hygrid_tpu.ops.sampling.apply_plan` (tested);
    image shape (..., H, W), any leading dims.  Differentiable: resampling
    is linear in the image, so the VJP is the transpose scatter
    (segment-sum over the plan's indices) — a Pallas call alone has no
    autodiff rule, which would break training through resamples on TPU.
    """
    dec = rowsep_decompose_cached(plan)
    if dec is None:
        return apply_plan(image, plan)
    return _apply_plan_pallas_ad(image, plan, tile_rows, force_banded)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _apply_plan_pallas_ad(image, plan, tile_rows, force_banded):
    return _apply_plan_pallas_impl(image, plan, tile_rows, force_banded)


def _apply_plan_pallas_fwd(image, plan, tile_rows, force_banded):
    return (_apply_plan_pallas_impl(image, plan, tile_rows, force_banded),
            image.shape)


def _apply_plan_pallas_bwd(plan, tile_rows, force_banded, img_shape, g):
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


@dataclasses.dataclass(frozen=True)
class LaunchGeometry:
    """Static launch geometry of the fused resample kernel, shared by the
    launcher (:func:`_apply_plan_pallas_impl`) and the roofline accounting
    (:func:`kernel_cost`) so reported FLOPs/bytes can never drift from what
    actually launches."""
    rowbase: np.ndarray          # (h1p,) int32, padded to tile_rows
    cols: np.ndarray             # (2, k, h1p, w1p) rebased column indices
    wts: np.ndarray              # (2, k, h1p, w1p) float32
    tilelo: np.ndarray           # (n_tiles,) per-tile source band starts
    collo: np.ndarray            # (n_ctiles,) per-column-tile band starts
    banded: bool
    band: int                    # source rows resident per tile (banded)
    col_banded: bool
    gb: int                      # leading planes per group
    n_groups: int
    pad_bc: int
    tr: int                      # output rows per tile
    n_tiles: int
    cb: int                      # selection-matrix K dim (source cols read)
    cw: int                      # output-column tile width
    n_ctiles: int
    k: int                       # plan terms per row-part
    w_pad: int                   # lane-padded source width
    w1p: int                     # padded output width
    pad_h1: int
    d_slots: tuple               # live row-parts: (0,), (1,) or (0, 1)
    phase_mode: bool             # selection matrices cached per row phase
    n_phases: int
    phase_idx: np.ndarray        # (h1p,) int32 row -> phase (phase mode)
    cols_ph: np.ndarray          # (n_phases, 2, k, w1p) (phase mode)
    wts_ph: np.ndarray           # (n_phases, 2, k, w1p) (phase mode)


def _launch_geometry(plan: SamplePlan, bc: int, esz: int,
                     tile_rows: int = 8,
                     force_banded: bool = False) -> LaunchGeometry:
    """Pure-integer launch geometry (no array work): row/column banding,
    plane grouping, and all pad amounts for a given plan + lead count +
    element size."""
    rowbase, cols, wts = rowsep_decompose_cached(plan)
    h, w = plan.src_shape
    _, k, h1, w1 = cols.shape
    budget = 8 * 2**20
    banded = force_banded or h * w * esz > budget

    tr = tile_rows
    pad_h1 = (-h1) % tr
    if pad_h1:
        # pad row bases edge-style so the padded tail does not widen the
        # last tile's source band (padded rows carry zero weights)
        rowbase = np.pad(rowbase, (0, pad_h1), mode="edge")
        cols = np.pad(cols, ((0, 0), (0, 0), (0, pad_h1), (0, 0)))
        wts = np.pad(wts, ((0, 0), (0, 0), (0, pad_h1), (0, 0)))
    n_tiles = (h1 + pad_h1) // tr

    # column bands: shrink the one-hot matrix (see _col_bands)
    cband = _col_bands(cols, wts, w, w1)
    if cband is not None:
        cw, collo, cb, cols = cband
        n_ctiles = collo.shape[0]
        w1p = n_ctiles * cw
        if w1p > w1:
            cols = np.pad(cols, ((0, 0),) * 3 + ((0, w1p - w1),))
            wts = np.pad(wts, ((0, 0),) * 3 + ((0, w1p - w1),))
        # pad source lanes to a 128 multiple so clamped band starts stay
        # aligned and in range
        w_pad = -(-w // 128) * 128
    else:
        # no column banding: lane-pad the source to a 128 multiple anyway
        # (Mosaic requires 128-aligned lane extents for the banded DMA
        # slices) and size the selection matrix to the padded width — the
        # pad rows of the one-hot are all-zero, so numerics are unchanged
        w_pad = -(-w // 128) * 128
        cw, collo, cb = w1, np.zeros(1, np.int32), w_pad
        n_ctiles, w1p = 1, w1

    # group leading planes so one group's resident source (full plane, or
    # double-buffered row band in banded mode) fits VMEM; a larger group
    # raises the matmul M-dim (MXU utilisation).  The group budget is wider
    # than the banding threshold: v5e VMEM comfortably holds a ~24 MB
    # source block, and a bigger M amortises the one-hot builds over more
    # planes.
    group_budget = 24 * 2**20
    if banded:
        tilelo, band = _band_height(rowbase, h, tr)
        # the in-kernel DMA slices the plane axis of the tiled HBM source,
        # so the group extent must be a multiple of the dtype's sublane
        # tile ("Slice shape must be aligned to tiling"); padded planes
        # cost only DMA bytes — the matmul M-dim pads to the MXU tile
        # regardless
        sub = max(1, 32 // esz)
        want = min(bc, group_budget // max(1, 2 * band * w_pad * esz))
        gb = max(sub, (want // sub) * sub)
    else:
        tilelo, band = np.zeros(n_tiles, np.int32), 0
        gb = max(1, min(bc, group_budget // max(1, h * w_pad * esz)))
    pad_bc = (-bc) % gb
    n_groups = (bc + pad_bc) // gb

    # live row-parts: plans whose terms all sit on one source row of the
    # band (nearest/exact-select, and the d=1 half of clamped edge rows)
    # skip the dead slot's one-hot build AND its matmul entirely
    d_slots = tuple(d for d in (0, 1) if wts[d].any()) or (0,)

    # row-phase deduplication: resampling at rational scale ratios repeats
    # its (rebased columns, weights) pattern every few rows (e.g. the
    # same-size 4K hex->rect plan has 3 distinct row patterns out of 2160).
    # When few enough phases exist, the kernel builds each phase's
    # selection matrix ONCE per column tile into VMEM scratch and rows just
    # index it — removing the per-row VPU one-hot build (the measured
    # bottleneck of banded resamples) and shrinking the shipped plan
    # constants from (h1p, ...) to (n_phases, ...).
    h1p = rowbase.shape[0]
    # Per-row blake2b digests instead of np.unique(axis=0) over the full
    # (h1p, ~4*k*w1p) pattern matrix (ADVICE r2: that built a ~0.5 GB
    # temporary + row lexsort per traced 4K plan); the digest dict is
    # O(h1p * 16) bytes.  phase_idx must stay COMPLETE even past the
    # 64-phase cap — periodic_decompose() consumes it — so only the
    # selection-matrix extraction below is gated on phase_mode.
    import hashlib
    csel = cols[d_slots, ...]
    wsel = wts[d_slots, ...]
    row_key: dict = {}
    phase_idx = np.empty(h1p, np.int64)
    first_rows: list = []
    for r in range(h1p):
        dg = hashlib.blake2b(csel[:, :, r, :].tobytes(), digest_size=16)
        dg.update(wsel[:, :, r, :].tobytes())
        p = row_key.setdefault(dg.digest(), len(row_key))
        if p == len(first_rows):
            first_rows.append(r)
        phase_idx[r] = p
    n_phases = len(first_rows)
    msize = 2 if esz == 2 else 4
    scratch_bytes = n_phases * len(d_slots) * cb * cw * msize
    phase_mode = n_phases <= 64 and scratch_bytes <= 8 * 2**20
    if phase_mode:
        first = np.asarray(first_rows, np.int64)
        cols_ph = cols[:, :, first, :].transpose(2, 0, 1, 3).copy()
        wts_ph = wts[:, :, first, :].transpose(2, 0, 1, 3).copy()
    else:
        cols_ph = wts_ph = np.zeros((0,), np.float32)
    return LaunchGeometry(
        rowbase=rowbase, cols=cols, wts=wts, tilelo=tilelo, collo=collo,
        banded=banded, band=band, col_banded=cband is not None, gb=gb,
        n_groups=n_groups, pad_bc=pad_bc, tr=tr, n_tiles=n_tiles, cb=cb,
        cw=cw, n_ctiles=n_ctiles, k=k, w_pad=w_pad, w1p=w1p, pad_h1=pad_h1,
        d_slots=d_slots, phase_mode=phase_mode, n_phases=n_phases,
        phase_idx=phase_idx.astype(np.int32), cols_ph=cols_ph,
        wts_ph=wts_ph)


def kernel_cost(plan: SamplePlan, lead: tuple, dtype,
                tile_rows: int = 8, force_banded: bool = False) -> dict:
    """Executed-work accounting for one fused-resample launch, derived from
    the SAME :class:`LaunchGeometry` the launcher uses (VERDICT r1 item 10:
    roofline numbers must come from shipped code, not hand math).

    Returns a dict with:
      ``mxu_flops``    — FLOPs executed by the selection matmuls (2*M*K*N
                         per dot, two row-parts per output row),
      ``vpu_elems``    — elements processed building the one-hot matrices
                         (k compare+select+add passes over (cb, cw) per
                         row-part per output row — the kernel's VPU work),
      ``hbm_bytes``    — source reads (full plane once per group, or banded
                         DMA per row tile), plan-constant block fetches, and
                         output writes,
      ``useful_flops`` — 2 * nonzero plan weights * planes (the algorithmic
                         gather-blend work a perfect scalar machine would do).
    """
    bc = int(np.prod(lead)) if lead else 1
    esz = jnp.dtype(dtype).itemsize
    g = _launch_geometry(plan, bc, esz, tile_rows, force_banded)
    h, w = plan.src_shape
    grid = g.n_groups * g.n_tiles * g.n_ctiles
    n_d = len(g.d_slots)
    msize = 2 if esz == 2 else 4
    out_esz = esz if jnp.issubdtype(jnp.dtype(dtype), jnp.floating) else 4
    useful_flops = 2 * int((plan.weights != 0).sum()) * bc
    per = None if force_banded else periodic_decompose(g, plan.out_shape[0])
    if per is not None:
        # pure-XLA periodic path: P*n_d*n_ctiles large matmuls
        P, S, lo, hi = per
        n = (hi - lo) // P
        mxu = P * n_d * g.n_ctiles * 2 * (bc * n) * g.cb * g.cw
        src = P * n_d * g.n_ctiles * bc * n * g.cb * esz
        consts = P * n_d * g.n_ctiles * g.cb * g.cw * msize
        outb = bc * plan.out_shape[0] * g.w1p * out_esz
        return dict(mxu_flops=mxu, vpu_elems=0,
                    hbm_bytes=src + consts + outb, src_bytes=src,
                    out_bytes=outb, plan_bytes=consts,
                    useful_flops=useful_flops, geometry=g, periodic=per)
    if out_esz == 2 and g.cw < 128:
        out_esz = 4        # the kernel launcher promotes narrow-column-tile
                           # outputs to f32 (Mosaic 16-bit narrow-store
                           # limitation); the periodic path above does not
    # per grid step: tr rows x live row-parts x one (gb,cb)@(cb,cw) dot
    mxu_flops = grid * g.tr * n_d * (2 * g.gb * g.cb * g.cw)
    cols_esz = 2 if (np.abs(g.cols) < 2 ** 15).all() else 4
    wts_esz = esz if esz == 2 else 4
    if g.phase_mode:
        # selection matrices built once per (group, column tile)
        vpu_elems = (g.n_groups * g.n_ctiles * g.n_phases * n_d * g.k
                     * (g.cb * g.cw))
        plan_bytes = (g.n_groups * g.n_ctiles * g.n_phases * 2 * g.k * g.cw
                      * (cols_esz + wts_esz))
    else:
        vpu_elems = grid * g.tr * n_d * g.k * (g.cb * g.cw)
        plan_bytes = grid * 2 * g.k * g.tr * g.cw * (cols_esz + wts_esz)
    if g.banded:
        if g.phase_mode and g.col_banded:
            # column-banded DMA: each (t, j) fetches only its column band
            src_bytes = (g.n_groups * g.n_ctiles * g.n_tiles * g.band
                         * g.gb * g.cb * esz)
        elif g.phase_mode:
            src_bytes = (g.n_groups * g.n_ctiles * g.n_tiles * g.band
                         * g.gb * g.w_pad * esz)
        else:
            src_bytes = (g.n_groups * g.n_tiles * g.band * g.gb
                         * g.w_pad * esz)
    else:
        src_bytes = g.n_groups * h * g.gb * g.w_pad * esz
    out_bytes = (bc + g.pad_bc) * (g.rowbase.shape[0]) * g.w1p * out_esz
    return dict(mxu_flops=mxu_flops, vpu_elems=vpu_elems,
                hbm_bytes=src_bytes + plan_bytes + out_bytes,
                src_bytes=src_bytes, out_bytes=out_bytes,
                plan_bytes=plan_bytes, useful_flops=useful_flops,
                geometry=g)


def periodic_decompose(geo: LaunchGeometry, h1: int, max_period: int = 16):
    """Detect an exactly periodic row structure: a span of output rows
    where ``phase_idx`` repeats with period P and ``rowbase`` advances by a
    constant stride S per period (integer-ratio resamples; e.g. the
    same-size 4K hex->rect plan is [2,1]-periodic with S=2, broken only by
    the clamped last row).  Returns ``(P, S, lo, hi)`` — the span
    ``[lo, hi)`` is periodic, ``lo % P == 0`` relative to itself — or None.
    Rows outside the span fall back to the XLA gather (they must be few)."""
    ph = geo.phase_idx[:h1].astype(np.int64)
    rb = geo.rowbase[:h1].astype(np.int64)
    for P in range(1, max_period + 1):
        if h1 < 3 * P:
            continue
        m0 = (h1 // (2 * P)) * P                  # a middle period start
        pattern = ph[m0:m0 + P]
        base = rb[m0:m0 + P] - rb[m0]
        S = int(rb[m0 + P] - rb[m0])
        if S < 0:
            continue
        i = np.arange(h1)
        per = (i - m0) % P
        exp_rb = rb[m0] + ((i - m0) // P) * S + base[per]
        ok = (ph == pattern[per]) & (rb == exp_rb)
        if not ok[m0]:
            continue
        lo = m0
        while lo - P >= 0 and ok[lo - P:lo].all():
            lo -= P
        hi = m0 + P
        while hi + P <= h1 and ok[hi:hi + P].all():
            hi += P
        if hi - lo >= h1 - 4 * max_period and hi - lo >= 2 * P:
            return P, S, lo, hi
    return None


def _build_selection_matrices(geo: LaunchGeometry, rows, wdtype):
    """Host-side one-hot selection matrices for the given output rows:
    ``(len(rows), n_d, n_ctiles, cb, cw)``, same math as the in-kernel
    build (``_tile_body``)."""
    n_d = len(geo.d_slots)
    out = np.zeros((len(rows), n_d, geo.n_ctiles, geo.cb, geo.cw),
                   np.float32)
    for ri, r in enumerate(rows):
        for di, d in enumerate(geo.d_slots):
            for kk in range(geo.k):
                c = geo.cols[d, kk, r]            # (w1p,) rebased
                wv = geo.wts[d, kk, r]
                for t in range(geo.n_ctiles):
                    cs = c[t * geo.cw:(t + 1) * geo.cw]
                    ws = wv[t * geo.cw:(t + 1) * geo.cw]
                    js = np.arange(cs.shape[0])
                    # zero-weight placeholder slots may carry out-of-band
                    # (e.g. negative rebased) columns — the in-kernel
                    # iota==c build ignores them; drop them here too
                    live = (ws != 0) & (cs >= 0) & (cs < geo.cb)
                    np.add.at(out[ri, di, t], (cs[live], js[live]),
                              ws[live])
    return out.astype(wdtype)


_PERIODIC_CACHE: dict = {}


def _apply_plan_periodic(image, plan: SamplePlan, geo: LaunchGeometry,
                         P: int, S: int, lo: int, hi: int):
    """Pure-XLA execution of an exactly periodic plan: for each period
    position q (and live row-part d), ALL its output rows come from a
    strided row slice of the source and share ONE selection matrix — so
    the whole resample is ``P * n_d * n_ctiles`` large matmuls
    (M = n_rows_per_phase * planes) at full MXU efficiency, with no
    per-row work at all.  The few non-periodic boundary rows ride the XLA
    gather.  This is the fastest path for integer-ratio resamples (the 4K
    same-size case: 10.4 ms phased-Pallas -> large-matmul XLA)."""
    import weakref

    h, w = plan.src_shape
    h1, w1 = plan.out_shape
    lead = image.shape[:-2]
    bc = int(np.prod(lead)) if lead else 1
    x = image.reshape((bc, h, w))
    out_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)
    if image.dtype.itemsize == 2:
        mdtype, precision = image.dtype, lax.Precision.DEFAULT
    else:
        mdtype, precision = jnp.float32, lax.Precision.HIGHEST
    if geo.w_pad > w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, geo.w_pad - w)))
    xm = x.astype(mdtype)

    # keyed by (plan identity, matmul dtype): geometry caches reuse one
    # SamplePlan across callers of different dtypes, and a bf16-rounded
    # matrix silently breaks the f32 bit-parity contract
    key = (id(plan), np.dtype(mdtype).name)
    cached = _PERIODIC_CACHE.get(key)
    if cached is None:
        mats = _build_selection_matrices(geo, range(lo, lo + P),
                                         np.dtype(mdtype).name)
        _PERIODIC_CACHE[key] = mats
        if len(_PERIODIC_CACHE) > 16:
            _PERIODIC_CACHE.pop(next(iter(_PERIODIC_CACHE)))
        weakref.finalize(plan, _PERIODIC_CACHE.pop, key, None)
        cached = mats
    mats = jnp.asarray(cached)                    # (P, n_d, n_t, cb, cw)

    n = (hi - lo) // P
    rb = geo.rowbase.astype(np.int64)
    clo = geo.collo.astype(np.int64)
    parts = []
    for q in range(P):
        acc = None
        for di, d in enumerate(geo.d_slots):
            start = int(rb[lo + q]) + d
            rows = xm[:, start:start + S * (n - 1) + 1:S, :] if S else (
                jnp.broadcast_to(xm[:, start:start + 1, :],
                                 (bc, n, geo.w_pad)))
            if geo.col_banded:
                bands = jnp.stack([
                    rows[:, :, int(clo[t]):int(clo[t]) + geo.cb]
                    for t in range(geo.n_ctiles)])   # (n_t, bc, n, cb)
            else:
                bands = rows[None]
            term = jnp.einsum("tbnc,tcw->bntw", bands, mats[q, di],
                              precision=precision,
                              preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        parts.append(acc.reshape(bc, n, geo.n_ctiles * geo.cw))
    main = jnp.stack(parts, axis=2).reshape(bc, n * P, geo.w1p)[..., :w1]

    pieces = []
    if lo > 0:
        head = SamplePlan(plan.idx[:, :lo], plan.weights[:, :lo],
                          plan.src_shape, (lo, w1), plan.exact_select)
        pieces.append(apply_plan(image.reshape((bc, h, w)), head)
                      .astype(jnp.float32))
    pieces.append(main)
    if hi < h1:
        tail = SamplePlan(plan.idx[:, hi:], plan.weights[:, hi:],
                          plan.src_shape, (h1 - hi, w1), plan.exact_select)
        pieces.append(apply_plan(image.reshape((bc, h, w)), tail)
                      .astype(jnp.float32))
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
    return out.astype(out_dtype).reshape(lead + (h1, w1))


def _apply_plan_pallas_impl(image, plan: SamplePlan, tile_rows: int = 8,
                            force_banded: bool = False):
    image = jnp.asarray(image)
    lead = image.shape[:-2]
    bc = int(np.prod(lead)) if lead else 1
    h, w = plan.src_shape
    esz = image.dtype.itemsize
    # Executor choice (HYGRID_RESAMPLE_IMPL in {auto, shift, pshift,
    # periodic, onehot} for A/B).  Measured routing lives in shift_prefers
    # (resample_shift.py): the shift-FMA kernel takes every
    # constant-stride plan whose source fits VMEM; >VMEM unit-stride
    # periodic plans ride the pure-XLA periodic-shift hybrid (round 5);
    # the rest fall through to the periodic/onehot MXU tiers.
    import os
    impl = os.environ.get("HYGRID_RESAMPLE_IMPL", "auto")
    if impl in ("auto", "shift", "pshift"):
        from .resample_shift import (shift_decompose_cached,
                                     apply_plan_shift, shift_prefers,
                                     apply_plan_periodic_shift)
        sgeo = shift_decompose_cached(plan)
        take_shift = sgeo is not None and impl == "shift"
        if (sgeo is not None and impl == "auto" and not force_banded
                and shift_prefers(plan, esz)
                # pure row-downsample: the incumbent MXU tiers measured
                # faster (0.31 vs 0.40 ms on the 512->256 leg, PERF.md r4)
                and not (sgeo.num == 1 and sgeo.den == 1
                         and plan.out_shape[0] < plan.src_shape[0])):
            take_shift = True
        if take_shift:
            return apply_plan_shift(image, plan, sgeo, tile_rows,
                                    force_banded)
        if sgeo is not None and sgeo.num == 1 and sgeo.den == 1:
            # periodicity gate shared with the executor (computed once
            # and passed through; the scan is an O(h1 x max_period)
            # numpy pass per trace)
            per = periodic_decompose(sgeo, plan.out_shape[0])
            # impl=pshift pins the hybrid where it applies and degrades
            # to the MXU tiers elsewhere, like every other pin
            take_hybrid = per is not None and impl == "pshift"
            # auto: the hybrid owns >VMEM unit-stride periodic plans —
            # measured 2.0-2.1x over the periodic MXU tier at the 4K
            # hex->rect config (0.92-1.0 vs 1.94 ms, PERF.md round 5);
            # at <=VMEM sizes the incumbents keep their measured wins.
            # The VMEM budget is the shift executor's own constant so
            # the two predicates stay complementary.
            from .resample_shift import _VMEM_BUDGET
            if (per is not None and impl == "auto" and not force_banded
                    and h * w * esz > _VMEM_BUDGET):
                take_hybrid = True
            if take_hybrid:
                return apply_plan_periodic_shift(image, plan, sgeo, per)
    geo = _launch_geometry(plan, bc, esz, tile_rows, force_banded)
    if not force_banded and impl != "onehot":
        per = periodic_decompose(geo, plan.out_shape[0])
        if per is not None:
            return _apply_plan_periodic(image, plan, geo, *per)
    rowbase, cols, wts = geo.rowbase, geo.cols, geo.wts
    tilelo, collo = geo.tilelo, geo.collo
    banded, band, gb = geo.banded, geo.band, geo.gb
    tr, n_tiles, cb, cw = geo.tr, geo.n_tiles, geo.cb, geo.cw
    n_ctiles, k, w_pad, w1p = geo.n_ctiles, geo.k, geo.w_pad, geo.w1p
    pad_bc, n_groups, pad_h1 = geo.pad_bc, geo.n_groups, geo.pad_h1
    cband = geo.col_banded
    h1, w1 = plan.out_shape

    # h-major layout: the kernel's dynamic row index then hits an untiled
    # leading dim (see _resample_kernel) — one cheap transpose per call
    src = jnp.moveaxis(image.reshape(bc, h, w), 0, 1)      # (h, bc, w)
    out_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)
    if jnp.dtype(out_dtype).itemsize == 2 and geo.cw < 128:
        # Mosaic cannot store a 16-bit (gb, 1, cw) slice when cw is
        # narrower than a vreg ("unsupported shape cast" at compile time);
        # accumulate such narrow-column-tile outputs (tiny plans only) in
        # f32 and cast back outside the kernel
        out_dtype = jnp.float32
    if w_pad > w:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, w_pad - w)))
    if pad_bc:
        src = jnp.pad(src, ((0, 0), (0, pad_bc), (0, 0)))
    # 4-D (h, n_groups, gb, w): the block's last two dims (gb, w) equal the
    # array's, satisfying Mosaic's block-divisibility rule for ANY gb
    src = src.reshape(h, n_groups, gb, w_pad)

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

    # compress the shipped plan constants: rebased column indices fit
    # int16, and for 16-bit images the weights ship in the matmul dtype
    # (the kernel casts the finished selection matrix down anyway) —
    # halves executable size and HBM for 4K-scale plans
    wdtype = mdtype if jnp.dtype(mdtype).itemsize == 2 else np.float32
    out_shape = jax.ShapeDtypeStruct((bc + pad_bc, h1 + pad_h1, w1p),
                                     out_dtype)
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(100 * 2 ** 20))
    interpret = jax.default_backend() != "tpu"
    kw = dict(tr=tr, cb=cb, cw=cw, k=k, mdtype=mdtype, precision=precision,
              col_banded=cband, d_slots=geo.d_slots)

    if geo.phase_mode:
        # phase-cached launch: grid (groups, column tiles, row tiles) so
        # each (g, t) builds its n_phases selection matrices exactly once
        cols_ph, wts_ph = geo.cols_ph, geo.wts_ph
        if (np.abs(cols_ph) < 2 ** 15).all():
            cols_ph = cols_ph.astype(np.int16)
        n_d = len(geo.d_slots)
        phase_in_specs = [
            pl.BlockSpec((geo.n_phases, 2, k, cw),
                         lambda g, t, j, rows, ph, rlo, clo: (0, 0, 0, t)),
            pl.BlockSpec((geo.n_phases, 2, k, cw),
                         lambda g, t, j, rows, ph, rlo, clo: (0, 0, 0, t)),
        ]
        out_specs = pl.BlockSpec(
            (gb, tr, cw), lambda g, t, j, rows, ph, rlo, clo: (g, j, t))
        pkw = dict(n_phases=geo.n_phases, **kw)
        scratch = [pltpu.VMEM((geo.n_phases, n_d, cb, cw), mdtype)]
        if banded:
            kern = functools.partial(_resample_kernel_phased_banded,
                                     band=band, n_tiles=n_tiles, **pkw)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(n_groups, n_ctiles, n_tiles),
                in_specs=phase_in_specs + [
                    pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=out_specs,
                scratch_shapes=scratch + [
                    pltpu.VMEM((2, band, gb, cb if cband else w_pad),
                               image.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
        else:
            kern = functools.partial(_resample_kernel_phased, **pkw)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(n_groups, n_ctiles, n_tiles),
                in_specs=phase_in_specs + [
                    pl.BlockSpec((h, 1, gb, w_pad),
                                 lambda g, t, j, rows, ph, rlo, clo:
                                 (0, g, 0, 0))],
                out_specs=out_specs,
                scratch_shapes=scratch,
            )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=compiler_params, interpret=interpret,
        )(jnp.asarray(rowbase), jnp.asarray(geo.phase_idx),
          jnp.asarray(tilelo), jnp.asarray(collo),
          jnp.asarray(cols_ph), jnp.asarray(wts_ph, dtype=wdtype), src)
        out = out[:bc, :h1, :w1]
        if jnp.issubdtype(image.dtype, jnp.floating) and \
                out.dtype != image.dtype:
            out = out.astype(image.dtype)
        return out.reshape(lead + (h1, w1))

    if (np.abs(cols) < 2 ** 15).all():
        cols = cols.astype(np.int16)
    common_in_specs = [
        pl.BlockSpec((1, 2, k, tr, cw),
                     lambda g, j, t, rows, rlo, clo: (0, 0, 0, j, t)),
        pl.BlockSpec((1, 2, k, tr, cw),
                     lambda g, j, t, rows, rlo, clo: (0, 0, 0, j, t)),
    ]
    out_specs = pl.BlockSpec(
        (gb, tr, cw), lambda g, j, t, rows, rlo, clo: (g, j, t))
    if banded:
        kern = functools.partial(_resample_kernel_banded, band=band,
                                 n_tiles=n_tiles, **kw)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups, n_tiles, n_ctiles),
            in_specs=common_in_specs + [
                pl.BlockSpec(memory_space=pl.ANY)],    # src stays in HBM
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, band, gb, w_pad), image.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
    else:
        kern = functools.partial(_resample_kernel, **kw)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups, n_tiles, n_ctiles),
            in_specs=common_in_specs + [
                pl.BlockSpec((h, 1, gb, w_pad),
                             lambda g, j, t, rows, rlo, clo: (0, g, 0, 0))],
            out_specs=out_specs,
        )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params,
        interpret=interpret,
    )(jnp.asarray(rowbase), jnp.asarray(tilelo), jnp.asarray(collo),
      jnp.asarray(cols)[None], jnp.asarray(wts, dtype=wdtype)[None], src)
    out = out[:bc, :h1, :w1]
    if jnp.issubdtype(image.dtype, jnp.floating) and out.dtype != image.dtype:
        out = out.astype(image.dtype)
    return out.reshape(lead + (h1, w1))
