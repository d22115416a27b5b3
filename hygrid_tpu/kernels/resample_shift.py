"""Shift-structured resampling executor: bandwidth-bound, no one-hot matmuls.

The one-hot MXU formulation (``resample_pallas.py``) turns the plan's column
gather into selection matmuls and runs at 4-10% of HBM bandwidth with
100-820x FLOP inflation (PERF.md roofline) -- the cost of making a gather
MXU-shaped.  This module exploits a stronger structural fact of the hot
plans: their column mapping has **constant stride**.  For output column j,
every term reads source column ``(num * j) // den + s`` for a handful of
integer shifts ``s`` (same-size hex->rect: num=den=1, s in {-1,0,1}; the
512->256 rect->hex leg: num=2, s in {-1..2}; the 256->512 hex->rect leg:
den=2, s in {-1,0,1}; the mosaic render: den=zoom).  Then

    out[c, r, :] = sum_slots  wplane[slot, r, :] * src[c, rowbase[r]+d][base_j + s]

where ``base_j + s`` is a *static-offset lane slice* per slot -- so the whole
resample is a few VPU FMAs per output row over rows DMA'd from HBM:

* ``den > 1`` (column upsample): the source is pre-stretched once in XLA
  (``jnp.repeat`` on lanes; ``stretched[j] == src[j // den]``), after which
  shifts become ``den * s`` at stride 1.
* ``num > 1`` (column downsample): the source is de-interleaved once in XLA
  into ``num`` lane-decimated planes (``plane_u[m] == src[num*m + u]``);
  slot (d, s) reads plane ``s % num`` at shift ``s // num``, stride 1.

Replaces the same reference slot as the one-hot kernel (the Numba-CUDA
``resample_on_hexagonal_grids``, ``/root/reference/HyGrid/geometry.py:8-155``)
for the stride-structured plan family; everything else keeps riding the
one-hot / periodic tiers (dispatch in ``resample_pallas``).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.sampling import SamplePlan

__all__ = ["shift_decompose", "apply_plan_shift",
           "apply_plan_periodic_shift", "ShiftGeometry"]

_MAX_SHIFTS = 8
_MAX_SLOTS = 10
_VMEM_BUDGET = 8 * 2**20
_STRIDES = ((1, 1), (1, 2), (1, 4), (1, 8), (2, 1), (4, 1), (1, 3), (3, 1))


@dataclasses.dataclass(frozen=True)
class ShiftGeometry:
    """Trace-time decomposition of a shift-structured plan.

    ``slots[i] = (d, u, a)``: row-part d reads de-interleaved source plane u
    (always 0 unless downsampling) at lane shift ``a`` relative to output
    column j; ``wplanes[i]`` carries that slot's per-(row, column) weights
    (the sum of every plan term that lands on the slot, accumulated in the
    plan's k order -- identical to the one-hot build's accumulation).
    """
    num: int                      # column stride numerator (downsample Q)
    den: int                      # column stride denominator (upsample Q)
    slots: tuple                  # ((d, u, a), ...)
    wplanes: np.ndarray           # (n_slots, h1, w1) float32
    rowbase: np.ndarray           # (h1,) int32
    phase_idx: np.ndarray         # (h1,) int32
    n_phases: int
    phase_mode: bool
    wphase: np.ndarray            # (n_phases, n_slots, w1) f32 (phase mode)


def shift_decompose(plan: SamplePlan, max_shifts: int = _MAX_SHIFTS):
    """Detect constant column stride and build slot weight planes, or None.

    Works from the same row-band decomposition as the one-hot kernel; the
    extra condition is that ``cols - (num*j)//den`` takes at most
    ``max_shifts`` distinct values over the live (weight != 0) entries.
    """
    from .resample_pallas import rowsep_decompose_cached
    dec = rowsep_decompose_cached(plan)
    if dec is None:
        return None
    rowbase, cols, wts = dec
    _, k, h1, w1 = cols.shape
    valid = wts != 0
    if not valid.any():
        return None
    j = np.arange(w1, dtype=np.int64)
    for num, den in _STRIDES:
        base = (num * j) // den
        delta = cols - base[None, None, None, :]
        shifts = np.unique(delta[valid])
        if len(shifts) <= max_shifts:
            break
    else:
        return None

    slots, planes = [], []
    for d in (0, 1):
        for s in shifts:
            wpl = np.zeros((h1, w1), np.float32)
            live = False
            for kk in range(k):
                m = valid[d, kk] & (delta[d, kk] == s)
                if m.any():
                    wpl = np.where(m, wpl + wts[d, kk], wpl)
                    live = True
            if live:
                s = int(s)
                if den > 1:          # pre-stretched source: stride-1 @ den*s
                    slots.append((d, 0, den * s))
                else:                # de-interleaved plane u, shift s//num
                    slots.append((d, s % num, s // num))
                planes.append(wpl)
    if not slots or len(slots) > _MAX_SLOTS:
        return None
    wplanes = np.stack(planes)

    # row-phase dedup (same digest approach as the one-hot launch geometry:
    # exact repetition only -- bit-identical weight rows share a phase)
    import hashlib
    row_key: dict = {}
    phase_idx = np.empty(h1, np.int32)
    first_rows: list = []
    for r in range(h1):
        dg = hashlib.blake2b(wplanes[:, r, :].tobytes(), digest_size=16)
        p = row_key.setdefault(dg.digest(), len(row_key))
        if p == len(first_rows):
            first_rows.append(r)
        phase_idx[r] = p
    n_phases = len(first_rows)
    phase_mode = n_phases <= 64 and \
        n_phases * len(slots) * w1 * 4 <= 4 * 2**20
    wphase = (wplanes[:, np.asarray(first_rows), :].transpose(1, 0, 2).copy()
              if phase_mode else np.zeros((0,), np.float32))
    return ShiftGeometry(
        num=num if den == 1 else 1, den=den, slots=tuple(slots),
        wplanes=wplanes, rowbase=rowbase.astype(np.int32),
        phase_idx=phase_idx, n_phases=n_phases, phase_mode=phase_mode,
        wphase=wphase)


def shift_prefers(plan: SamplePlan, esz: int) -> bool:
    """Measured routing predicate (PERF.md round 4): the shift executor
    wins wherever its (possibly pre-stretched / de-interleaved) source
    fits resident in VMEM AND the per-row work amortises the per-row
    dynamic-index overhead — 4K mosaic 2.0x (w1=3840), 720p video 2.0x
    (w1=640/1280), same-width legs 1.1-1.2x (w1=512).  Two measured
    refusals: (1) the >VMEM banded variant is SLOWER than the periodic
    tier (2.89 vs 1.94 ms, 4K hex->rect) and needs sublane-padded batch
    groups, so banded sources fall through; (2) column-strided plans
    (num>1 or den>1) at NARROW outputs lose to the one-hot MXU tier —
    0.52 vs 0.28 ms (num=2, w1=256) and 0.48 vs 0.34 ms (den=2, w1=512)
    on the true north-star legs — while the same families WIN from
    w1=640 up (video), so strided plans require w1 >= 640."""
    geo = shift_decompose_cached(plan)
    if geo is None:
        return False
    h, w = plan.src_shape
    num, den = geo.num, geo.den
    if (num > 1 or den > 1) and plan.out_shape[1] < 640:
        return False
    if den > 1:
        w_eff = w * den
    elif num > 1:
        w_eff = -(-w // num)
    else:
        w_eff = w
    a_min = min(a for _, _, a in geo.slots)
    a_max = max(a for _, _, a in geo.slots)
    w1p = -(-plan.out_shape[1] // 128) * 128
    w_lane = -(-(max(0, -a_min) + max(w_eff, a_max + w1p)) // 128) * 128
    n_planes = num if num > 1 else 1
    return n_planes * h * w_lane * esz <= _VMEM_BUDGET


_SHIFT_CACHE: dict = {}


def shift_decompose_cached(plan: SamplePlan):
    """Memoized :func:`shift_decompose` (same id-keyed weakref scheme as
    ``rowsep_decompose_cached`` -- plans are interned by the geometry-level
    caches, and the decomposition is a full numpy pass)."""
    import weakref
    key = id(plan)
    if key in _SHIFT_CACHE:
        return _SHIFT_CACHE[key]
    geo = shift_decompose(plan)
    _SHIFT_CACHE[key] = geo
    weakref.finalize(plan, _SHIFT_CACHE.pop, key, None)
    while len(_SHIFT_CACHE) > 16:
        oldest = next(iter(_SHIFT_CACHE))
        if oldest == key:
            break
        _SHIFT_CACHE.pop(oldest)
    return geo


def _rows_body(read_row, wrow, out_ref, *, tr, slots, offs, w1p):
    """Shared per-tile body: tr output rows, each a few static-lane-slice
    FMAs.  ``read_row(d, u) -> (gb, W)``; ``wrow(r, i) -> (1, w1p)``."""
    for r in range(tr):
        acc = jnp.zeros((out_ref.shape[0], w1p), jnp.float32)
        cache = {}
        for i, (d, u, _a) in enumerate(slots):
            if (d, u) not in cache:
                cache[(d, u)] = read_row(r, d, u)
            srow = cache[(d, u)][:, offs[i]:offs[i] + w1p]
            acc = acc + srow.astype(jnp.float32) * wrow(r, i).astype(
                jnp.float32)
        out_ref[:, r, :] = acc.astype(out_ref.dtype)


def _shift_kernel_full(rowref, phref, _tilelo, wref, src_ref, out_ref, *,
                       tr, slots, offs, w1p, dense):
    """Full-source kernel: src block (num, h, 1, gb, W) resident in VMEM;
    rows indexed dynamically on the untiled h dim."""
    j = pl.program_id(1)

    def read_row(r, d, u):
        return src_ref[u, rowref[j * tr + r] + d, 0]

    if dense:
        def wrow(r, i):
            return wref[0, r, i][None, :]
    else:
        def wrow(r, i):
            return wref[phref[j * tr + r], i][None, :]
    _rows_body(read_row, wrow, out_ref, tr=tr, slots=slots, offs=offs,
               w1p=w1p)


def _shift_kernel_banded(rowref, phref, tilelo, wref, src_any, out_ref,
                         band_buf, sems, *, tr, slots, offs, w1p, dense,
                         band, n_tiles):
    """Banded kernel: source stays in HBM; each row tile DMAs its
    (num, band, gb, W) row band into a double-buffered VMEM scratch,
    prefetching tile j+1 while computing tile j."""
    g = pl.program_id(0)
    j = pl.program_id(1)

    def band_dma(tile, slot):
        return pltpu.make_async_copy(
            src_any.at[:, pl.ds(tilelo[tile], band), g],
            band_buf.at[slot], sems.at[slot])

    @pl.when(j == 0)
    def _():
        band_dma(0, 0).start()

    @pl.when(j + 1 < n_tiles)
    def _():
        band_dma(j + 1, (j + 1) % 2).start()

    band_dma(j, j % 2).wait()
    slot = j % 2
    lo = tilelo[j]

    def read_row(r, d, u):
        return band_buf[slot, u, rowref[j * tr + r] - lo + d]

    if dense:
        def wrow(r, i):
            return wref[0, r, i][None, :]
    else:
        def wrow(r, i):
            return wref[phref[j * tr + r], i][None, :]
    _rows_body(read_row, wrow, out_ref, tr=tr, slots=slots, offs=offs,
               w1p=w1p)


def apply_plan_shift(image, plan: SamplePlan, geo: ShiftGeometry = None,
                     tile_rows: int = 8, force_banded: bool = False):
    """Execute a shift-structured plan.  Same numerics contract as
    ``apply_plan`` (<= 1e-5-grade agreement; weight accumulation order
    matches the one-hot build).  Called from the ``apply_plan_pallas``
    dispatcher, which owns the custom VJP."""
    if geo is None:
        geo = shift_decompose_cached(plan)
    if geo is None:
        raise ValueError("plan is not shift-structured")
    image = jnp.asarray(image)
    lead = image.shape[:-2]
    bc = int(np.prod(lead)) if lead else 1
    h, w = plan.src_shape
    h1, w1 = plan.out_shape
    esz = image.dtype.itemsize
    num, den = geo.num, geo.den

    src = image.reshape(bc, h, w)
    if den > 1:                       # column upsample: pre-stretch lanes
        src = jnp.repeat(src, den, axis=-1)
        w_eff = w * den
    elif num > 1:                     # column downsample: de-interleave
        wq = -(-w // num)
        if wq * num > w:
            src = jnp.pad(src, ((0, 0), (0, 0), (0, wq * num - w)))
        # (bc, h, wq, num) -> (num, h, bc, wq): plane u holds src[num*m + u]
        src = jnp.moveaxis(src.reshape(bc, h, wq, num), (3, 1), (0, 1))
        w_eff = wq
    else:
        w_eff = w
    # lane padding: every slot's static slice [pad_l + a, pad_l + a + w1p)
    # must stay inside the buffer
    a_min = min(a for _, _, a in geo.slots)
    a_max = max(a for _, _, a in geo.slots)
    pad_l = max(0, -a_min)
    w1p = -(-w1 // 128) * 128
    w_lane = pad_l + max(w_eff, a_max + w1p)
    w_lane = -(-w_lane // 128) * 128
    if num == 1:                      # (bc, h, w_eff) -> pad lanes
        src = jnp.pad(src, ((0, 0), (0, 0),
                            (pad_l, w_lane - pad_l - w_eff)))
        src = jnp.moveaxis(src, 0, 1)[None]          # (1, h, bc, w_lane)
    else:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, 0),
                            (pad_l, w_lane - pad_l - w_eff)))
    offs = tuple(pad_l + a for _, _, a in geo.slots)

    # plane grouping (same scheme as the one-hot launcher): sublane-aligned
    # groups sized so the resident source fits the VMEM budget
    n_planes = src.shape[0]
    banded = force_banded or n_planes * h * w_lane * esz > _VMEM_BUDGET
    sub = max(1, 32 // esz)
    if banded:
        tr = tile_rows
        h1p = -(-h1 // tr) * tr
        rowbase = np.pad(geo.rowbase, (0, h1p - h1), mode="edge")
        from .resample_pallas import _band_height
        tilelo, band = _band_height(rowbase, h, tr)
        want = max(1, _VMEM_BUDGET // max(1, 2 * n_planes * band
                                          * w_lane * esz))
        # the band DMA requires a sublane-aligned group (gb=3 is a Mosaic
        # compile error, round-4 A/B; root-caused round 5, PERF.md "gb=3
        # root cause": Mosaic rejects the async-copy source slice with
        # "Slice shape along dimension 3 must be aligned to tiling (4),
        # but is 3" — the gb second-minor extent must be a multiple of
        # the HBM memref's sublane tiling); small batches pad up — the
        # dispatcher's shift_prefers() routes those to the periodic tier,
        # this stays correct for explicit impl="shift"/force_banded
        gb = max(sub, (min(bc, want) // sub) * sub)
        import os as _os
        if _os.environ.get("HYGRID_SHIFT_GB"):     # diagnostic override
            gb = int(_os.environ["HYGRID_SHIFT_GB"])  # (unaligned values
            # reproduce the Mosaic bug deterministically — repro capture in
            # benchmarks/gb3_repro.py; never set in production)
    else:
        tr = tile_rows
        h1p = -(-h1 // tr) * tr
        rowbase = np.pad(geo.rowbase, (0, h1p - h1), mode="edge")
        tilelo, band = np.zeros(1, np.int32), 0
        want = max(1, min(bc, 24 * 2**20 // max(1, n_planes * h
                                                 * w_lane * esz)))
        # minimise batch padding: bc=48 with want=36 runs 2 groups of 24
        # (zero pad), not 2 groups of 36 (1.5x wasted work)
        gb = -(-bc // -(-bc // want))
    pad_bc = (-bc) % gb
    n_groups = (bc + pad_bc) // gb
    n_tiles = h1p // tr
    if pad_bc:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, pad_bc), (0, 0)))
    src = src.reshape(n_planes, h, n_groups, gb, w_lane)

    phase_idx = np.pad(geo.phase_idx, (0, h1p - h1), mode="edge")
    n_slots = len(geo.slots)
    if geo.phase_mode:
        wts = geo.wphase                             # (n_phases, n_slots, w1)
        dense = False
    else:
        wts = geo.wplanes.transpose(1, 0, 2)         # (h1, n_slots, w1)
        wts = np.pad(wts, ((0, h1p - h1), (0, 0), (0, 0)))[None]
        dense = True                                 # (1, h1p, n_slots, w1)
    if w1p > w1:
        wts = np.pad(wts, ((0, 0),) * (wts.ndim - 1) + ((0, w1p - w1),))
    # weights ship in bf16 when that is lossless (exact-select masks and
    # power-of-two blends) — halves the dense-mode weight traffic, which
    # dominates HBM for phase-diverse plans like the 4K mosaic; the kernel
    # upcasts to f32 before the FMA either way, so numerics are unchanged
    if np.array_equal(wts.astype(jnp.bfloat16).astype(np.float32), wts):
        wts = wts.astype(jnp.bfloat16)

    out_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)
    out_shape = jax.ShapeDtypeStruct((bc + pad_bc, h1p, w1p), out_dtype)
    out_specs = pl.BlockSpec((gb, tr, w1p), lambda g, j, *pref: (g, j, 0))
    if dense:
        w_spec = pl.BlockSpec((1, tr, n_slots, w1p),
                              lambda g, j, *pref: (0, j, 0, 0))
    else:
        w_spec = pl.BlockSpec((geo.n_phases, n_slots, w1p),
                              lambda g, j, *pref: (0, 0, 0))
    kw = dict(tr=tr, slots=geo.slots, offs=offs, w1p=w1p, dense=dense)
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(100 * 2**20))
    interpret = jax.default_backend() != "tpu"

    if banded:
        kern = functools.partial(_shift_kernel_banded, band=band,
                                 n_tiles=n_tiles, **kw)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups, n_tiles),
            in_specs=[w_spec, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, n_planes, band, gb, w_lane), image.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
    else:
        kern = functools.partial(_shift_kernel_full, **kw)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups, n_tiles),
            in_specs=[w_spec,
                      pl.BlockSpec((n_planes, h, 1, gb, w_lane),
                                   lambda g, j, *pref: (0, 0, g, 0, 0))],
            out_specs=out_specs,
        )
    args = (jnp.asarray(rowbase), jnp.asarray(phase_idx),
            jnp.asarray(tilelo), jnp.asarray(wts), src)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=compiler_params, interpret=interpret,
    )(*args)
    out = out[:bc, :h1, :w1]
    if jnp.issubdtype(image.dtype, jnp.floating) and out.dtype != image.dtype:
        out = out.astype(image.dtype)
    return out.reshape(lead + (h1, w1))


def apply_plan_periodic_shift(image, plan: SamplePlan,
                              geo: ShiftGeometry = None, per=None):
    """Hybrid periodic-rows x shift-columns executor: pure XLA, zero
    per-row work, zero Pallas alignment hazards (round 5, VERDICT r4
    item 2).

    Applies when a plan is BOTH shift-structured at unit column stride
    (``num == den == 1``) and exactly row-periodic (``periodic_decompose``:
    phase pattern repeats every P output rows while ``rowbase`` advances a
    constant S rows per period).  Then output phase q over the periodic
    span is a handful of elementwise FMAs

        out[:, lo+q::P, :] = sum_i  w[q, i, :] * src[:, rb+d_i :: S, a_i:]

    of *strided row views* x *static lane slices* — affine index maps XLA
    fuses straight into the output stack, so the whole resample is one
    fusion at source-read + output-write traffic.  This replaces the two
    MXU tiers on >VMEM banded plans (the same reference slot as the Numba
    ``resample_on_hexagonal_grids``, ``geometry.py:8-155``), where the
    periodic one-hot tier pays selection-matmul FLOP inflation plus
    band-stack relayouts (1.94 ms at 4K ~ 52 GB/s) and the banded shift
    kernel pays sublane-padded batch groups (bc=3 -> gb=16, 5.3x DMA and
    compute waste; PERF.md round 4).

    Numerics: same slot accumulation order as ``_rows_body`` (f32 FMA over
    the shift slots in decomposition order), so agreement with the gather
    path is at the same <=1e-5 grade as the other shift executors.

    Raises ValueError when the plan does not qualify; the dispatcher
    (``_apply_plan_pallas_impl``) checks the same predicates first.
    """
    from .resample_pallas import periodic_decompose
    from ..ops.sampling import apply_plan
    if geo is None:
        geo = shift_decompose_cached(plan)
    if geo is None or geo.num != 1 or geo.den != 1:
        raise ValueError("plan is not unit-stride shift-structured")
    h, w = plan.src_shape
    h1, w1 = plan.out_shape
    if per is None:
        # periodic_decompose only touches .phase_idx / .rowbase, which
        # the shift geometry carries unpadded at exactly h1 rows; the
        # dispatcher passes its own result through to avoid re-scanning
        per = periodic_decompose(geo, h1)
    if per is None:
        raise ValueError("plan is not row-periodic")
    P, S, lo, hi = per

    image = jnp.asarray(image)
    lead = image.shape[:-2]
    bc = int(np.prod(lead)) if lead else 1
    x = image.reshape(bc, h, w)
    out_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)

    a_min = min(a for _, _, a in geo.slots)
    a_max = max(a for _, _, a in geo.slots)
    pad_l = max(0, -a_min)
    pad_r = max(0, a_max + w1 - w)
    xp = (jnp.pad(x, ((0, 0), (0, 0), (pad_l, pad_r)))
          if pad_l or pad_r else x)

    n = (hi - lo) // P
    rb0 = int(geo.rowbase[lo])
    # Two formulations, interleaved-A/B'd on device (PERF.md round 5):
    # the default "stack" form computes each phase part separately and
    # interleaves with stack+reshape — the HLO materialises the parts,
    # their relayouts, and the stack, yet measures 0.92-0.99 ms at 4K.
    # The "uniform" single-fusion form (contiguous slice + free (n, P)
    # reshape per slot when the period's row bases advance by 1 and
    # S == P) produces the output in one fusion with zero intermediates
    # but measures 1.31-1.36 ms: its one fusion re-reads the source per
    # slot-use (5x) from HBM, which costs more than the stack form's
    # materialise+re-read round trips.  A measured refusal — kept behind
    # HYGRID_PSHIFT_FORM=uniform for re-evaluation on other shapes.
    d_max = max(d for d, _u, _a in geo.slots)
    import os
    form = os.environ.get("HYGRID_PSHIFT_FORM", "stack")
    uniform = (form == "uniform" and S == P and P > 0
               and all(int(geo.rowbase[lo + q]) == rb0 + q
                       for q in range(P))
               and rb0 + d_max + n * P <= xp.shape[1])
    if uniform:
        acc = None
        views = {}
        for i, (d, _u, a) in enumerate(geo.slots):
            wq = geo.wplanes[i, lo:lo + P, :]        # (P, w1) f32
            if not wq.any():
                continue
            if d not in views:
                s0 = rb0 + d
                views[d] = xp[:, s0:s0 + n * P, :].reshape(
                    bc, n, P, xp.shape[-1])
            sl = views[d][:, :, :, pad_l + a:pad_l + a + w1]
            term = sl.astype(jnp.float32) * jnp.asarray(wq)[None, None]
            acc = term if acc is None else acc + term
        main = acc.astype(out_dtype).reshape(bc, n * P, w1)
    else:
        parts = []
        for q in range(P):
            r0 = lo + q
            start = int(geo.rowbase[r0])
            acc = None
            rows_cache = {}
            for i, (d, _u, a) in enumerate(geo.slots):
                wv = geo.wplanes[i, r0, :]           # (w1,) f32
                if not wv.any():
                    continue
                if d not in rows_cache:
                    s0 = start + d
                    rows_cache[d] = (
                        xp[:, s0:s0 + S * (n - 1) + 1:S, :] if S else
                        jnp.broadcast_to(xp[:, s0:s0 + 1, :],
                                         (bc, n, xp.shape[-1])))
                sl = rows_cache[d][:, :, pad_l + a:pad_l + a + w1]
                term = (sl.astype(jnp.float32)
                        * jnp.asarray(wv)[None, None, :])
                acc = term if acc is None else acc + term
            parts.append(acc)
        # (bc, n, P, w1) -> (bc, n*P, w1): row-major reinterpretation
        main = jnp.stack(parts, axis=2).astype(out_dtype).reshape(
            bc, n * P, w1)

    # cast each boundary piece BEFORE the concat: a f32 concat would
    # materialise the whole output at twice the bytes just to cast it
    pieces = []
    if lo > 0:
        head = SamplePlan(plan.idx[:, :lo], plan.weights[:, :lo],
                          plan.src_shape, (lo, w1), plan.exact_select)
        pieces.append(apply_plan(x, head).astype(out_dtype))
    pieces.append(main)
    if hi < h1:
        tail = SamplePlan(plan.idx[:, hi:], plan.weights[:, hi:],
                          plan.src_shape, (h1 - hi, w1), plan.exact_select)
        pieces.append(apply_plan(x, tail).astype(out_dtype))
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
    return out.astype(out_dtype).reshape(lead + (h1, w1))


def shift_cost(plan: SamplePlan, lead: tuple, dtype,
               force_banded: bool = False) -> dict:
    """Roofline accounting for one shift-executor launch (the analogue of
    ``resample_pallas.kernel_cost``): VPU FMA elements, HBM bytes (source
    pre-pass + kernel reads + weight fetches + output writes)."""
    geo = shift_decompose_cached(plan)
    if geo is None:
        return None
    bc = int(np.prod(lead)) if lead else 1
    esz = jnp.dtype(dtype).itemsize
    h, w = plan.src_shape
    h1, w1 = plan.out_shape
    w1p = -(-w1 // 128) * 128
    n_slots = len(geo.slots)
    vpu = bc * h1 * w1p * n_slots
    pre = 0
    if geo.den > 1 or geo.num > 1:
        pre = bc * h * w * esz * (1 + max(geo.den, 1) / max(geo.num, 1))
    src_reads = bc * h * w * esz            # banded: each row read ~once
    wts_bytes = (geo.n_phases if geo.phase_mode else h1) * n_slots * w1p * 4
    out_bytes = bc * h1 * w1p * esz
    return dict(vpu_elems=vpu, hbm_bytes=pre + src_reads + wts_bytes
                + out_bytes, useful_flops=2 * int((plan.weights != 0).sum())
                * bc, geometry=geo)
