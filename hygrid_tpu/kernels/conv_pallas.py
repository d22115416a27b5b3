"""Fused Pallas hex-convolution kernel (Mosaic / TPU).

This is the hot-path kernel of the framework (the analogue slot of the
reference's native CUDA kernel, SURVEY.md section 2.3) for the
small-channel hex convs that dominate image pipelines.

Formulation (see ``nn.functional._hex_conv2d_packed`` for the derivation):
with C channels and Q = 128 // C, pack Q consecutive pixels into one
128-lane vector; each (kernel row, packed-column shift) pair collapses to a
dense (128, Q*Cout) "shift (x) tap-weight" matrix.  The kernel loads the
even/odd packed row planes into VMEM ONCE per batch element and runs all
~(2r-1)*2*2 matmuls from VMEM on the MXU — the pure-XLA packed path re-reads
HBM for every term, which is exactly the traffic this kernel removes.

Scope: stride 1, groups 1, 128 % C == 0, C <= 128 (C = 128 is the q=1
degenerate packing: pure dense per-tap matmuls), and Cout * Q <= 512 with
Q = 128 // C (the ``pallas_conv_applicable`` predicate — e.g. Cout <= 64
at C = 16, Cout <= 512 at C = 128).  The public
``hex_conv2d(..., impl="pallas")`` wrapper falls back to the equivalent
XLA path outside this envelope.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.functional import _hex_kernel_rows, _merge_phases

__all__ = ["packed_hex_conv_pallas", "pallas_conv_applicable",
           "hex_conv_stack_pallas", "pack_planes", "unpack_planes",
           "hex_packed_maxpool2", "plane_geometry"]

# Full-plane stack-layer kernels above this VMEM need (sized as the layer
# call's own vmem_limit computation, bg=1) auto-route to the >VMEM banded
# tier / XLA twin — see hex_conv_stack_pallas.  v5e VMEM is 128 MB; the
# layer call caps its request at 110 MB.
_STACK_VMEM_BUDGET = 100 * 2 ** 20


def pallas_conv_applicable(c: int, co: int, stride: int, groups: int,
                           n_elements: int | None = None) -> bool:
    """Envelope of the single-op Pallas conv.

    The round-2/3 ``> 2**24`` element fence is GONE (VERDICT r3 item 6):
    the intermittent Mosaic internal errors tracked the whole-image-as-
    one-block launch, so inputs above ``_CONV_BAND_THRESHOLD`` elements
    now take a row-banded grid (planes stay in HBM, double-buffered band
    DMA per grid step — the same scheme as the banded stack layer) instead
    of being fenced to the XLA path.  ``n_elements`` is kept for API
    stability; it no longer rejects.
    """
    del n_elements
    return (stride == 1 and groups == 1 and c <= 128 and 128 % c == 0
            and co * (128 // c) <= 512)


# inputs above this many elements run the banded single-op kernel (half the
# round-3 crash threshold, for margin)
_CONV_BAND_THRESHOLD = 2 ** 23


def _phase_meta(radius: int, d: int, parity: int, q: int
                ) -> Tuple[List, List, int, int]:
    """Static metadata: for each phase a list of
    (src_parity, row_offset, packed_col_shift, [(qs, qo, tap), ...])."""
    rows = _hex_kernel_rows(radius)
    c0e = [(1 + t * d - ((i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]
    c0o = [(2 + t * d - ((1 + i * d + parity) % 2)) // 2
           for (i, t, ln, st) in rows]

    def build(c0, row_base):
        slots = {}
        for (i, t, ln, start) in rows:
            src = (row_base + i * d) % 2
            r0 = (row_base + i * d) // 2
            for k in range(ln):
                cshift = c0[i] + d * k
                for qo in range(q):
                    s = qo + cshift
                    sblk, qs = s // q, s % q
                    slots.setdefault((src, r0, sblk), []).append(
                        (qs, qo, start + k))
        return sorted(slots.items())

    return build(c0e, 0), build(c0o, 1), max(c0e), max(c0o)


def _assemble_mats(kernel, meta, q: int, c: int, co: int, dtype):
    """Stack the per-slot Kronecker matrices: (N, Q*C, Q*Cout)."""
    mats = []
    for (_, entries) in meta:
        m = jnp.zeros((q * c, q * co), jnp.float32)
        for qs, qo, tap in entries:
            m = m.at[qs * c:(qs + 1) * c, qo * co:(qo + 1) * co].add(
                kernel[:, :, tap].T.astype(jnp.float32))
        mats.append(m)
    return jnp.stack(mats).astype(dtype)


def _conv_kernel(xe_ref, xo_ref, me_ref, mo_ref, oute_ref, outo_ref,
                 *, meta_e, meta_o, wp_out):
    """One batch element: all phase matmuls from VMEM-resident row planes."""
    n_lanes_out = oute_ref.shape[-1]

    def run_phase(meta, mref, oref):
        ho = oref.shape[1]
        acc = jnp.zeros((ho * wp_out, n_lanes_out), jnp.float32)
        for idx, ((src, r0, sblk), _) in enumerate(meta):
            ref = xe_ref if src == 0 else xo_ref
            blk = ref[0, r0:r0 + ho, sblk:sblk + wp_out, :]
            blk2 = blk.reshape(ho * wp_out, blk.shape[-1])
            acc = acc + jnp.dot(blk2, mref[idx],
                                preferred_element_type=jnp.float32)
        oref[0, :, :, :] = acc.reshape(ho, wp_out, n_lanes_out).astype(
            oref.dtype)

    run_phase(meta_e, me_ref, oute_ref)
    run_phase(meta_o, mo_ref, outo_ref)


def _conv_kernel_banded(xe_any, xo_any, me_ref, mo_ref, oute_ref, outo_ref,
                        bufe, bufo, sems, *, meta_e, meta_o, wp_out,
                        tr: int, L: int, n_bands: int):
    """Row-banded single-op conv: the packed row planes stay in HBM; each
    (batch, band) grid step DMAs ``L = tr + max_r0`` rows of both planes
    into a double-buffered VMEM scratch (prefetching band j+1 while
    computing band j) and runs the phase matmuls for ``tr`` output rows.
    Lifts the round-3 ``> 2**24`` whole-image-block fence (VERDICT r3
    item 6)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    def dmas(band, slot):
        return (
            pltpu.make_async_copy(
                xe_any.at[i, pl.ds(band * tr, L)], bufe.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                xo_any.at[i, pl.ds(band * tr, L)], bufo.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(j == 0)
    def _():
        for cpy in dmas(0, 0):
            cpy.start()

    @pl.when(j + 1 < n_bands)
    def _():
        for cpy in dmas(j + 1, (j + 1) % 2):
            cpy.start()

    slot = j % 2
    for cpy in dmas(j, slot):
        cpy.wait()
    n_lanes_out = oute_ref.shape[-1]

    def run_phase(meta, mref, oref):
        acc = jnp.zeros((tr * wp_out, n_lanes_out), jnp.float32)
        for idx, ((src, r0, sblk), _) in enumerate(meta):
            buf = bufe if src == 0 else bufo
            blk = buf[slot, r0:r0 + tr, sblk:sblk + wp_out, :]
            acc = acc + jnp.dot(blk.reshape(tr * wp_out, blk.shape[-1]),
                                mref[idx],
                                preferred_element_type=jnp.float32)
        oref[0, :, :, :] = acc.reshape(tr, wp_out, n_lanes_out).astype(
            oref.dtype)

    run_phase(meta_e, me_ref, oute_ref)
    run_phase(meta_o, mo_ref, outo_ref)


def packed_hex_conv_pallas(x, kernel, bias=None, *, even_odd_offset: int = 0,
                           radius: int, padding: int = 0, dilation: int = 1,
                           band_rows: int = None):
    """Hex conv via the fused Pallas kernel.  Same semantics as
    ``hex_conv2d(..., stride=1, groups=1)``; tested equal to the direct
    path.  Inputs above ``_CONV_BAND_THRESHOLD`` elements (or an explicit
    ``band_rows``) run the row-banded grid — see
    :func:`_conv_kernel_banded`.

    Differentiable: ``pallas_call`` has no reverse-mode rule, so a custom
    VJP pulls back through the equivalent XLA packed conv (round 4 —
    previously ``jax.grad`` through ``impl="pallas"`` raised; hot training
    paths still use ``HexConvStack``'s hand-written Pallas backward)."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    kernel = jnp.asarray(kernel)
    x = x.astype(kernel.dtype)
    if padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding),
                        (padding, padding)))
    parity = (even_odd_offset + padding) % 2
    band = band_rows
    if band is None and x.size > _CONV_BAND_THRESHOLD:
        band = 32
    out = _single_op_ad(x, kernel, parity, radius, dilation, band)
    if bias is not None:
        out = out + jnp.asarray(bias).reshape(1, -1, 1, 1).astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _single_op_ad(x, kernel, parity, radius, dilation, band_rows):
    return _single_op_impl(x, kernel, parity, radius, dilation, band_rows)


def _single_op_fwd(x, kernel, parity, radius, dilation, band_rows):
    return _single_op_impl(x, kernel, parity, radius, dilation,
                           band_rows), (x, kernel)


def _single_op_bwd(parity, radius, dilation, band_rows, res, g):
    from ..nn.functional import _hex_conv2d_packed
    x, kernel = res
    _, vjp = jax.vjp(
        lambda xx, kk: _hex_conv2d_packed(xx, kk, None, parity, radius, 1,
                                          dilation, 1), x, kernel)
    return vjp(g)


_single_op_ad.defvjp(_single_op_fwd, _single_op_bwd)


def _single_op_impl(x, kernel, parity, radius, dilation, band_rows):
    b, c, h, w = x.shape
    co = kernel.shape[0]
    d = dilation
    q = 128 // c

    ks = 2 * radius - 1
    k_h = (ks - 1) * d + 1
    k_w_t1 = 2 * d * (ks - 1) + 1
    wt = 2 * w + 1
    wo = (wt - 2 - k_w_t1) // 2 + 1
    ho_e = (h - k_h) // 2 + 1
    ho_o = (h - 1 - k_h) // 2 + 1

    meta_e, meta_o, _, _ = _phase_meta(radius, d, parity, q)

    max_c = max(max(c0 for ((s, r, c0), _) in m) for m in (meta_e, meta_o))
    wp_out = -(-wo // q)
    src_wp = wp_out + max_c + 1
    if band_rows is not None:
        # the banded DMA slices the HBM plane along its second-minor dim;
        # Mosaic requires that slice aligned to the sublane tiling
        # ("Slice shape along dimension 2 must be aligned to tiling (8),
        # but is 66" — the round-4 deterministic repro of the round-3
        # 'intermittent' crashes)
        align = max(8, 32 // x.dtype.itemsize)
        src_wp = -(-src_wp // align) * align
    if src_wp * q > w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, src_wp * q - w)))
    else:
        x = x[:, :, :, :src_wp * q]

    xl = jnp.moveaxis(x, 1, -1)
    he2 = (h + 1) // 2
    ho2 = h // 2
    xe = xl[:, 0::2].reshape(b, he2, src_wp, q * c)
    xo = xl[:, 1::2].reshape(b, ho2, src_wp, q * c)
    max_r0 = max(r for m in (meta_e, meta_o) for ((s, r, c0), _) in m)

    me = _assemble_mats(kernel, meta_e, q, c, co, x.dtype)
    mo = _assemble_mats(kernel, meta_o, q, c, co, x.dtype)
    interpret = jax.default_backend() != "tpu"

    if band_rows is not None:
        tr = int(band_rows)
        ho_max = max(ho_e, ho_o)
        n_bands = -(-ho_max // tr)
        rows_need = n_bands * tr + max_r0
        L = tr + max_r0
        xe = jnp.pad(xe, ((0, 0), (0, max(0, rows_need - he2)),
                          (0, 0), (0, 0)))
        xo = jnp.pad(xo, ((0, 0), (0, max(0, rows_need - ho2)),
                          (0, 0), (0, 0)))
        kern = functools.partial(_conv_kernel_banded, meta_e=meta_e,
                                 meta_o=meta_o, wp_out=wp_out, tr=tr, L=L,
                                 n_bands=n_bands)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_bands),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((len(meta_e), q * c, q * co),
                             lambda i, j: (0, 0, 0)),
                pl.BlockSpec((len(meta_o), q * c, q * co),
                             lambda i, j: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tr, wp_out, q * co),
                             lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, tr, wp_out, q * co),
                             lambda i, j: (i, j, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, L, src_wp, q * c), x.dtype),
                pltpu.VMEM((2, L, src_wp, q * c), x.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        oute, outo = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, n_bands * tr, wp_out, q * co),
                                     x.dtype),
                jax.ShapeDtypeStruct((b, n_bands * tr, wp_out, q * co),
                                     x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(100 * 2 ** 20)),
            interpret=interpret,
        )(xe, xo, me, mo)
        oute, outo = oute[:, :ho_e], outo[:, :ho_o]
    else:
        rows_need = max(ho_e, ho_o) + max_r0
        xe = jnp.pad(xe, ((0, 0), (0, max(0, rows_need - he2)),
                          (0, 0), (0, 0)))
        xo = jnp.pad(xo, ((0, 0), (0, max(0, rows_need - ho2)),
                          (0, 0), (0, 0)))
        he_rows, ho_rows = xe.shape[1], xo.shape[1]
        kern = functools.partial(_conv_kernel, meta_e=meta_e, meta_o=meta_o,
                                 wp_out=wp_out)
        oute, outo = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, he_rows, src_wp, q * c),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ho_rows, src_wp, q * c),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((len(meta_e), q * c, q * co),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((len(meta_o), q * c, q * co),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ho_e, wp_out, q * co),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ho_o, wp_out, q * co),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, ho_e, wp_out, q * co), x.dtype),
                jax.ShapeDtypeStruct((b, ho_o, wp_out, q * co), x.dtype),
            ],
            interpret=interpret,
        )(xe, xo, me, mo)

    def unpack(o, ho):
        o = o.reshape(b, ho, wp_out * q, co)[:, :, :wo]
        return jnp.moveaxis(o, -1, 1)

    return _merge_phases(unpack(oute, ho_e), unpack(outo, ho_o), None)


# ------------------- banded packed-domain stack layer -----------------------

def _stack_layer_kernel_banded(xe_ref, xo_ref, me_ref, mo_ref, be_ref,
                               oute_ref, outo_ref,
                               ine, ino, oute_s, outo_s, ztop, fsem, osem,
                               *, meta_e, meta_o, brr, h2, wp_out,
                               relu: bool, has_bias: bool, tail_cut: int,
                               bg: int, L: int, n_bands: int):
    """Row-banded 'same' layer: the packed planes stay in HBM
    (``memory_space=ANY``); each grid step DMAs one double-buffered row
    band of ``L = brr + max_r0`` rows into VMEM, runs the slot matmuls for
    ``brr`` output rows at batch group ``bg``, and DMA-stores the band.

    This is the VERDICT-r2-item-2 middle path: the full-plane kernel at
    bg=8 reaches 86% of the executed-FLOP roofline but its ~86 MB VMEM
    footprint starves neighbour-kernel overlap end-to-end; banding keeps
    bg=8-sized matmul M-dims at ~1/4 the VMEM.  In-place aliasing is
    impossible here (band j+1 reads rows band j just wrote), so margins
    are re-written each layer: every band stores full-width rows with
    zeroed margin columns, rows outside the interior are masked to zero,
    and band 0 also zeroes the two top margin rows.

    Layout (banded mode only): rows_tot_b = 1 + h2p + max_r0 with TWO top
    zero rows and interior at rows [2, 2 + h2); h2p = n_bands * brr >=
    h2 + max_r0 - 1.  The phase metadata is unchanged — band j's fetch
    window starts at margined row ``1 + j*brr``, making the in-window read
    row exactly ``meta_r0 + local_row``.
    """
    g = pl.program_id(0)
    j = pl.program_id(1)
    lanes = oute_s.shape[-1]

    def fetches(band, slot):
        start = 1 + band * brr
        return (
            pltpu.make_async_copy(
                xe_ref.at[pl.ds(g * bg, bg), pl.ds(start, L)],
                ine.at[slot], fsem.at[slot, 0]),
            pltpu.make_async_copy(
                xo_ref.at[pl.ds(g * bg, bg), pl.ds(start, L)],
                ino.at[slot], fsem.at[slot, 1]))

    @pl.when(j == 0)
    def _():
        for c in fetches(0, 0):
            c.start()

    @pl.when(j + 1 < n_bands)
    def _():
        for c in fetches(j + 1, (j + 1) % 2):
            c.start()

    slot = j % 2
    for c in fetches(j, slot):
        c.wait()

    # validity masks: rows past the interior and ragged tail pixels -> 0.
    # Kept BOOLEAN and applied with a select, not a multiply: the accs of
    # masked-out rows can read the plane's never-written bottom margin
    # rows [2 + h2p, rows_tot) — uninitialized bytes whose bf16 patterns
    # may be NaN, and NaN * 0 = NaN would flow into rows the next layer
    # reads as zeros (interior reads themselves never touch those rows).
    rid = lax.broadcasted_iota(jnp.int32, (brr, wp_out, lanes), 0) + j * brr
    keep = rid < h2
    if tail_cut:
        col_ids = lax.broadcasted_iota(jnp.int32, (brr, wp_out, lanes), 1)
        lane_ids = lax.broadcasted_iota(jnp.int32, (brr, wp_out, lanes), 2)
        keep = keep & ~((col_ids == wp_out - 1) & (lane_ids >= tail_cut))

    def run_phase(meta, mref, out_s):
        acc = jnp.zeros((bg * brr * wp_out, lanes), jnp.float32)
        for idx, ((src, r0, sblk), _) in enumerate(meta):
            ref = ine if src == 0 else ino
            blk = ref[slot, 0:bg, r0:r0 + brr, sblk:sblk + wp_out, :]
            acc = acc + jnp.dot(blk.reshape(bg * brr * wp_out, blk.shape[-1]),
                                mref[idx], preferred_element_type=jnp.float32)
        if has_bias:
            acc = acc + be_ref[0, :].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out = jnp.where(keep[None], acc.reshape(bg, brr, wp_out, lanes), 0.0)
        out_s[...] = jnp.zeros(out_s.shape, out_s.dtype)
        out_s[:, :, 1:1 + wp_out, :] = out.astype(out_s.dtype)

    run_phase(meta_e, me_ref, oute_s)
    run_phase(meta_o, mo_ref, outo_s)

    stores = (
        pltpu.make_async_copy(
            oute_s, oute_ref.at[pl.ds(g * bg, bg), pl.ds(2 + j * brr, brr)],
            osem.at[0]),
        pltpu.make_async_copy(
            outo_s, outo_ref.at[pl.ds(g * bg, bg), pl.ds(2 + j * brr, brr)],
            osem.at[1]))
    for c in stores:
        c.start()

    @pl.when(j == 0)
    def _():
        ztop[...] = jnp.zeros(ztop.shape, ztop.dtype)
        tops = (
            pltpu.make_async_copy(
                ztop, oute_ref.at[pl.ds(g * bg, bg), pl.ds(0, 2)],
                osem.at[2]),
            pltpu.make_async_copy(
                ztop, outo_ref.at[pl.ds(g * bg, bg), pl.ds(0, 2)],
                osem.at[3]))
        for c in tops:
            c.start()
        for c in tops:
            c.wait()

    for c in stores:
        c.wait()


def _stack_impl_banded(x, kernels, biases, statics):
    """Banded-layer variant of ``_stack_impl`` (norm-free, uniform width).
    See :func:`_stack_layer_kernel_banded` for the layout."""
    (radius, dilation, activation, final_activation, _fused, batch_group,
     _norm_kinds, band_rows) = statics[:8]
    data_format = statics[8] if len(statics) > 8 else "NCHW"
    if data_format == "NHWC":
        # banded tier stays NCHW-native (it is the rare >VMEM fallback);
        # adapt at the boundary
        nchw_statics = statics[:8] + ("NCHW",)
        out = _stack_impl_banded(jnp.moveaxis(x, -1, 1), kernels, biases,
                                 nchw_statics)
        return jnp.moveaxis(out, 1, -1)
    b, c, h, w = x.shape
    d = dilation
    relu = activation == "relu"
    chans = [c] + [int(k.shape[0]) for k in kernels]
    if any(ci != c for ci in chans):
        raise ValueError("banded stack requires uniform channel widths")
    q = 128 // c
    h2 = h // 2
    wp = -(-w // q)
    dtype = x.dtype
    bg = batch_group or min(8, b)
    while b % bg:
        bg -= 1
    brr = band_rows
    meta_e, meta_o = _phase_meta_same(radius, d, q)
    max_r0 = max(r0 for m in (meta_e, meta_o) for ((_, r0, _sb), _) in m)
    max_sblk = max(sb for m in (meta_e, meta_o) for ((_, _r, sb), _) in m)
    mcr = max(0, max_sblk - 1)
    # Mosaic DMA slices must be 8-aligned along the sublane (second-to-
    # minor) dim: a 34-wide plane sliced whole out of its 40-wide tiled
    # allocation is refused ("Slice shape along dimension 2 must be
    # aligned to tiling (8)"), so round the packed-column extent up to a
    # multiple of 8 — the extra margin columns are zero and never read.
    cols_tot = -(-(1 + wp + mcr) // 8) * 8
    n_bands = -(-(h2 + max_r0 - 1) // brr)
    h2p = n_bands * brr
    rows_tot = 1 + h2p + max_r0
    L = brr + max_r0

    xl = jnp.moveaxis(x, 1, -1)
    pad_w = wp * q - w
    if pad_w:
        xl = jnp.pad(xl, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    xe = xl[:, 0::2].reshape(b, h2, wp, q * c)
    xo = xl[:, 1::2].reshape(b, h2, wp, q * c)

    def with_margins(v):
        return jnp.pad(v, ((0, 0), (2, rows_tot - 2 - h2),
                           (1, cols_tot - 1 - wp), (0, 0)))

    xe, xo = with_margins(xe), with_margins(xo)
    tail_cut = (w % q) * c if (w % q) else 0

    for li, kern in enumerate(kernels):
        me = _assemble_mats(kern, meta_e, q, c, c, dtype)
        mo = _assemble_mats(kern, meta_o, q, c, c, dtype)
        has_bias = biases[li] is not None
        bvec = (jnp.tile(biases[li], q) if has_bias
                else jnp.zeros((q * c,), dtype))[None]
        layer_relu = relu and (final_activation or li < len(kernels) - 1)
        kfn = functools.partial(
            _stack_layer_kernel_banded, meta_e=meta_e, meta_o=meta_o,
            brr=brr, h2=h2, wp_out=wp, relu=layer_relu, has_bias=has_bias,
            tail_cut=tail_cut, bg=bg, L=L, n_bands=n_bands)
        xe, xo = pl.pallas_call(
            kfn,
            grid=(b // bg, n_bands),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((len(meta_e), 128, q * c), lambda g, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((len(meta_o), 128, q * c), lambda g, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q * c), lambda g, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, rows_tot, cols_tot, 128), dtype),
                jax.ShapeDtypeStruct((b, rows_tot, cols_tot, 128), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, bg, L, cols_tot, 128), dtype),
                pltpu.VMEM((2, bg, L, cols_tot, 128), dtype),
                pltpu.VMEM((bg, brr, cols_tot, 128), dtype),
                pltpu.VMEM((bg, brr, cols_tot, 128), dtype),
                pltpu.VMEM((bg, 2, cols_tot, 128), dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(
                    110 * 2 ** 20,
                    (4 * bg * L + 2 * bg * brr + 2 * bg) * cols_tot * 128
                    * dtype.itemsize + 8 * bg * brr * wp * 128
                    + 24 * 2 ** 20))),
            interpret=jax.default_backend() != "tpu",
        )(xe, xo, me, mo, bvec)

    def unpack(v):
        v = v[:, 2:2 + h2, 1:1 + wp]
        return v.reshape(b, h2, wp * q, c)[:, :, :w]
    ye, yo = unpack(xe), unpack(xo)
    out = jnp.zeros((b, h, w, c), dtype)
    out = out.at[:, 0::2].set(ye).at[:, 1::2].set(yo)
    return jnp.moveaxis(out, -1, 1)


# ---------------------- packed-domain 'same' conv stack ----------------------

def _same_meta_feasible(radius: int, d: int, q: int) -> bool:
    """Whether the 'same' meta fits the packed plane layout's fixed
    1-row/1-packed-col top/left zero margin: the folded padding
    ``d*(radius-1)`` may reach further up/left than one plane row/column
    for deep dilations or radii (e.g. d=3 or radius>=4 at q=1), in which
    case the stack must run the equivalent XLA chain instead of reading
    out of the plane block."""
    meta = _phase_meta_same(radius, d, q)
    return all(r >= 0 and sb >= 0
               for m in meta for ((_s, r, sb), _) in m)


def _plane_meta_margins(radius: int, d: int, q: int):
    """(max_r0, max_sblk) over both phases of the 'same' meta — the
    bottom/right margin sizing of the packed plane layout."""
    meta = _phase_meta_same(radius, d, q)
    max_r0 = max(r for m in meta for ((_s, r, _sb), _) in m)
    max_sblk = max(sb for m in meta for ((_s, _r, sb), _) in m)
    return max(0, max_r0 - 1), max(0, max_sblk - 1)


def _plane_row_margin(radius: int, d: int) -> int:
    """Bottom row margin of the packed plane layout (q-independent: row
    deltas come from the hex kernel's rows alone)."""
    return _plane_meta_margins(radius, d, 1)[0]


def plane_geometry(radius: int, dilation: int, q: int, h: int, w: int):
    """Packed-plane layout for an (h, w) image at packing q: returns
    ``(h2, wp, rows_tot, cols_tot)`` — interior rows/packed-cols and the
    margined plane dims (1 zero row/col at top/left, meta-sized slack at
    bottom/right)."""
    h2 = h // 2
    wp = -(-w // q)
    mb, mcr = _plane_meta_margins(radius, dilation, q)
    return h2, wp, 1 + h2 + mb, 1 + wp + mcr


def pack_planes(v, *, radius: int, dilation: int = 1, nhwc: bool = True):
    """Pack an image (NHWC by default, else NCHW) into margined even/odd
    row planes — the packed stack kernels' native I/O.  From NHWC this is
    a pure reshape (+ zero pads); from NCHW it pays a moveaxis relayout."""
    v = jnp.asarray(v)
    ci = v.shape[-1] if nhwc else v.shape[1]
    if not (ci <= 128 and 128 % ci == 0):
        raise ValueError(f"channel width {ci} unsupported by packed planes")
    b = v.shape[0]
    h, w = (v.shape[1], v.shape[2]) if nhwc else (v.shape[2], v.shape[3])
    if h % 2:
        raise ValueError("even image height required")
    qi = 128 // ci
    h2, wp, rows_tot, cols_tot = plane_geometry(radius, dilation, qi, h, w)
    pad_w = wp * qi - w
    vl = v if nhwc else jnp.moveaxis(v, 1, -1)
    if pad_w:
        vl = jnp.pad(vl, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    xe = vl[:, 0::2].reshape(b, h2, wp, qi * ci)
    xo = vl[:, 1::2].reshape(b, h2, wp, qi * ci)
    pads = ((0, 0), (1, rows_tot - h2 - 1), (1, cols_tot - wp - 1), (0, 0))
    return jnp.pad(xe, pads), jnp.pad(xo, pads)


def unpack_planes(planes, *, w: int, cout: int, radius: int,
                  dilation: int = 1, nhwc: bool = True):
    """Inverse of :func:`pack_planes`: margined planes -> image."""
    xe, xo = planes
    b = xe.shape[0]
    h2 = xe.shape[1] - 1 - _plane_row_margin(radius, dilation)
    qout = 128 // cout
    wp = -(-w // qout)
    ye = xe[:, 1:1 + h2, 1:1 + wp].reshape(b, h2, wp * qout, cout)[:, :, :w]
    yo = xo[:, 1:1 + h2, 1:1 + wp].reshape(b, h2, wp * qout, cout)[:, :, :w]
    out = jnp.zeros((b, 2 * h2, w, cout), xe.dtype)
    out = out.at[:, 0::2].set(ye).at[:, 1::2].set(yo)
    return out if nhwc else jnp.moveaxis(out, -1, 1)


def hex_packed_maxpool2(planes, *, image_width: int, in_channels: int,
                        out_channels: int | None = None, radius: int = 2,
                        dilation: int = 1):
    """2x2 / stride-2 hex max-pool DIRECTLY on margined packed planes.

    The reference pool semantics (``HexFrames.py:305-327``: window
    (gi, gj) reads rows ``2gi + {0,1}``, cols ``(gi%2) + 2gj + {0,1}``)
    collapse beautifully in the packed even/odd-row domain:

    * the window's two rows are ``even_plane[gi]`` and ``odd_plane[gi]``
      — the row-pair reduce is ONE elementwise ``maximum(xe, xo)``, no
      slicing at all;
    * pooled rows re-split into planes by parity of ``gi`` (strided
      slices on the untiled row dim);
    * the column pair-max plus the q -> q/2 repacking for the next
      (wider) stage collapse into two fixed 0/1 lane-selection matmuls
      per row parity (each output lane reads exactly one source lane, so
      the matmul is an exact gather — MXU work instead of lane
      shuffles), with the next packed column's contribution carried by
      one shifted operand.

    Returns margined planes packed for ``out_channels`` (default
    ``2 * in_channels`` — the usual width doubling; extra channels are
    zero), i.e. directly consumable by the next
    ``hex_conv_stack_pallas(..., packed_io=True)`` stage.  Max only (the
    model pool), no-NaN data assumed.
    """
    xe, xo = planes
    c = int(in_channels)
    q = 128 // c
    if q < 2:
        raise ValueError("packed pool needs q >= 2 (in_channels <= 64)")
    c2 = int(out_channels) if out_channels is not None else 2 * c
    if not (c <= c2 <= 128 and 128 % c2 == 0):
        raise ValueError(f"out_channels {c2} unsupported")
    q2 = 128 // c2
    if q2 * 2 != q:
        raise ValueError("packed pool requires out packing q/2 "
                         f"(in_channels {c} -> out_channels {c2})")
    w = int(image_width)
    h2 = xe.shape[1] - 1 - _plane_row_margin(radius, dilation)
    hn = h2                      # pooled height = h / 2
    if hn % 2:
        raise ValueError("packed pool needs the pooled height even "
                         "(plane pair symmetry)")
    wn = (w - 1) // 2
    wp = -(-w // q)
    h2o, wpo, rows_tot2, cols_tot2 = plane_geometry(
        radius, dilation, q2, hn, wn)

    ie = xe[:, 1:1 + h2, 1:1 + wp]
    io = xo[:, 1:1 + h2, 1:1 + wp]
    rowred = jnp.maximum(ie, io)                      # (b, hn, wp, 128)
    nxt = jnp.concatenate(
        [rowred[:, :, 1:], jnp.zeros_like(rowred[:, :, :1])], axis=2)

    import numpy as _np
    outs = []
    for p in (0, 1):
        rows = rowred[:, p::2]
        rows_n = nxt[:, p::2]
        ys = []
        for t in (0, 1):
            m = _np.zeros((128, 128), _np.float32)
            n = _np.zeros((128, 128), _np.float32)
            for p2 in range(q2):
                o = 2 * p2 + p + t
                tgt = m if o < q else n
                oq = o if o < q else o - q
                for cc in range(c):
                    tgt[oq * c + cc, p2 * c2 + cc] = 1.0
            y = rows @ jnp.asarray(m, rows.dtype)
            if n.any():
                y = y + rows_n @ jnp.asarray(n, rows.dtype)
            ys.append(y)
        outs.append(jnp.maximum(ys[0], ys[1])[:, :, :wpo])

    if wpo * q2 > wn:            # zero the fake tail pixels
        mask = _np.zeros((wpo, 128), _np.float32)
        for pc in range(wpo):
            for p2 in range(q2):
                if pc * q2 + p2 < wn:
                    mask[pc, p2 * c2:p2 * c2 + c2] = 1.0
        maskj = jnp.asarray(mask, outs[0].dtype)
        outs = [o * maskj for o in outs]

    pads = ((0, 0), (1, rows_tot2 - h2o - 1), (1, cols_tot2 - wpo - 1),
            (0, 0))
    return jnp.pad(outs[0], pads), jnp.pad(outs[1], pads)


def _phase_meta_same(radius: int, d: int, q: int):
    """Static metadata for a 'same' hex conv (padding = d * (radius - 1),
    the shape-preserving padding of a dilated kernel) applied directly in
    the packed even/odd-row domain.

    The spatial padding is folded into the tap shifts (which may go
    negative, reading the one zero row/packed-column prepended to each
    plane) so chained layers never leave the packed layout.
    """
    p = d * (radius - 1)
    parity = p % 2  # conv-internal parity: (offset 0 + padding) % 2
    rows = _hex_kernel_rows(radius)
    c0e = [(1 + t * d - ((i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]
    c0o = [(2 + t * d - ((1 + i * d + parity) % 2)) // 2
           for (i, t, ln, st) in rows]

    def build(c0, row_base):
        slots = {}
        for (i, t, ln, start) in rows:
            ri = row_base + i * d - p          # padded -> original row delta
            src = ri % 2
            r0 = ri // 2 + 1                   # +1: prepended zero row
            for k in range(ln):
                c = c0[i] + d * k - p          # padded -> original col shift
                for qo in range(q):
                    s = qo + c
                    sblk, qs = s // q + 1, s % q   # +1: prepended zero col
                    slots.setdefault((src, r0, sblk), []).append(
                        (qs, qo, start + k))
        return sorted(slots.items())

    return build(c0e, 0), build(c0o, 1)


def _stack_layer_kernel(*refs, meta_e, meta_o, h2, wp_out,
                        relu: bool, has_bias: bool, tail_cut: int,
                        bg: int = 1, norm: str | None = None,
                        gn_groups: int = 1, c_out: int = 0,
                        n_pixels: int = 0, eps: float = 1e-5,
                        split: bool = False):
    """One packed-domain 'same' layer, IN-PLACE (``input_output_aliases``
    maps xe->oute / xo->outo).  Inputs carry a 1-row/1-packed-col zero
    margin (indices in ``meta`` are pre-shifted); the kernel computes BOTH
    phases first (all reads), then writes the full output blocks — margins
    zeroed in-kernel (cheap VMEM stores), interiors last.  The aliasing is
    kept as a memory-reuse hint but correctness no longer depends on it
    physically preserving the input's margins (XLA's memory-space
    assignment can split the aliased pair across HBM/VMEM — see the store
    comment below).  Ragged tail pixels are masked in-kernel so the next
    layer's edge reads see proper zero padding.  ``bg`` batch elements
    share each grid step (bigger matmul M-dim).

    ``norm`` fuses a per-layer normalisation after conv+bias:

    * ``"gn"`` — per-sample GroupNorm over ``gn_groups`` channel groups:
      both phase pre-activations are held in VMEM, tail pixels masked to
      zero so plain interior sums equal valid-pixel sums, group statistics
      reduced per batch element, then normalise + affine
      (``nb_ref = [gamma_tiled, beta_tiled]``).  This is what lets
      conv->GN->ReLU model stages chain in the packed domain (VERDICT r2
      weak #1 — the model layer previously left the fast path at every
      norm).
    * ``"affine"`` — per-channel ``x * scale + shift`` (folded
      inference-time BatchNorm; ``nb_ref = [scale_tiled, shift_tiled]``).

    ``split=True`` is the fused concat-input layer: two same-geometry
    input plane pairs (A, B) and two Kronecker matrix sets, computing
    ``conv(concat(A, B), K) = conv(A, Ka) + conv(B, Kb)`` without ever
    materialising the concatenation (decoder skip-join stages,
    PERF.md r3).  Output aliases the A planes; B is read-only.
    """
    if split:
        (xe_ref, xo_ref, xe2_ref, xo2_ref, me_ref, mo_ref, me2_ref,
         mo2_ref, be_ref, nb_ref, oute_ref, outo_ref) = refs
    else:
        (xe_ref, xo_ref, me_ref, mo_ref, be_ref, nb_ref,
         oute_ref, outo_ref) = refs
        xe2_ref = xo2_ref = me2_ref = mo2_ref = None
    lanes = oute_ref.shape[-1]

    def keep_mask(dt):
        # mask built in-kernel: pallas kernels cannot capture array consts
        col_ids = lax.broadcasted_iota(jnp.int32, (wp_out, lanes), 0)
        lane_ids = lax.broadcasted_iota(jnp.int32, (wp_out, lanes), 1)
        return (~((col_ids == wp_out - 1) & (lane_ids >= tail_cut))).astype(dt)

    def accum(meta, mref, m2ref):
        acc = jnp.zeros((bg * h2 * wp_out, lanes), jnp.float32)
        for idx, ((src, r0, sblk), _) in enumerate(meta):
            ref = xe_ref if src == 0 else xo_ref
            blk = ref[0:bg, r0:r0 + h2, sblk:sblk + wp_out, :]
            acc = acc + jnp.dot(blk.reshape(bg * h2 * wp_out, blk.shape[-1]),
                                mref[idx], preferred_element_type=jnp.float32)
            if split:
                ref2 = xe2_ref if src == 0 else xo2_ref
                blk2 = ref2[0:bg, r0:r0 + h2, sblk:sblk + wp_out, :]
                acc = acc + jnp.dot(
                    blk2.reshape(bg * h2 * wp_out, blk2.shape[-1]),
                    m2ref[idx], preferred_element_type=jnp.float32)
        if has_bias:
            acc = acc + be_ref[0, :].astype(jnp.float32)
        return acc.reshape(bg, h2, wp_out, lanes)

    if norm is None:
        # no cross-phase coupling: run phases sequentially (one f32 acc
        # live at a time — the VMEM shape the r2 numbers were measured at)
        def run_phase(meta, mref, m2ref):
            out = accum(meta, mref, m2ref)
            if relu:
                out = jnp.maximum(out, 0.0)
            if tail_cut:
                out = out * keep_mask(out.dtype)[None, None]
            return out

        oe = run_phase(meta_e, me_ref, me2_ref)
        oo = run_phase(meta_o, mo_ref, mo2_ref)
    else:
        acc_e = accum(meta_e, me_ref, me2_ref)
        acc_o = accum(meta_o, mo_ref, mo2_ref)
        if tail_cut:
            km = keep_mask(jnp.float32)[None, None]
            acc_e = acc_e * km
            acc_o = acc_o * km
        if norm == "gn":
            cpg = c_out // gn_groups
            flat_e = acc_e.reshape(bg, h2 * wp_out, lanes)
            flat_o = acc_o.reshape(bg, h2 * wp_out, lanes)
            s = jnp.sum(flat_e, axis=1) + jnp.sum(flat_o, axis=1)
            ss = (jnp.sum(flat_e * flat_e, axis=1)
                  + jnp.sum(flat_o * flat_o, axis=1))          # (bg, lanes)
            lane_g = (lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
                      % c_out) // cpg
            cnt = float(n_pixels * cpg)
            mean_l = jnp.zeros_like(s)
            var_l = jnp.zeros_like(s)
            for g in range(gn_groups):
                mg = (lane_g == g).astype(jnp.float32)          # (1, lanes)
                mu = jnp.sum(s * mg, axis=-1, keepdims=True) / cnt
                m2 = jnp.sum(ss * mg, axis=-1, keepdims=True) / cnt
                mean_l = mean_l + mu * mg
                var_l = var_l + jnp.maximum(m2 - mu * mu, 0.0) * mg
            inv = lax.rsqrt(var_l + eps)
            scale = inv * nb_ref[0, :].astype(jnp.float32)      # (bg, lanes)
            shift = nb_ref[1, :].astype(jnp.float32) - mean_l * scale
            acc_e = acc_e * scale[:, None, None, :] + shift[:, None, None, :]
            acc_o = acc_o * scale[:, None, None, :] + shift[:, None, None, :]
        else:  # "affine"
            scale = nb_ref[0, :].astype(jnp.float32)
            shift = nb_ref[1, :].astype(jnp.float32)
            acc_e = acc_e * scale + shift
            acc_o = acc_o * scale + shift
        if relu:
            acc_e = jnp.maximum(acc_e, 0.0)
            acc_o = jnp.maximum(acc_o, 0.0)
        if tail_cut:
            # re-mask: the norm's shift moved tail pixels off zero
            km = keep_mask(jnp.float32)[None, None]
            acc_e = acc_e * km
            acc_o = acc_o * km
        oe, oo = acc_e, acc_o

    # All reads done; write the FULL output blocks.  The kernel must NOT
    # rely on input_output_aliases physically preserving the input's zero
    # margins: XLA's memory-space-assignment pass sometimes places the
    # aliased output in VMEM (S(1)) while the operand stays in HBM — a
    # fresh buffer whose margin bytes were never written (observed as
    # all-NaN model outputs at specific batch sizes).  Margins are
    # re-zeroed with row-aligned strip stores (the interior rows carry
    # their zero margin columns inside one store via concatenate);
    # zeroing the whole block first instead measured -30% end-to-end.
    rows_tot = oute_ref.shape[1]
    cols_tot = oute_ref.shape[2]
    lanes_o = oute_ref.shape[3]

    def store_full(dst, val):
        # interior straight from the accumulators (the single store the
        # r2 kernel shipped), then four tiny margin strips
        dt = dst.dtype
        dst[0:bg, 1:1 + h2, 1:1 + wp_out, :] = val.astype(dt)
        dst[0:bg, 0:1] = jnp.zeros((bg, 1, cols_tot, lanes_o), dt)
        if rows_tot > 1 + h2:
            dst[0:bg, 1 + h2:rows_tot] = jnp.zeros(
                (bg, rows_tot - 1 - h2, cols_tot, lanes_o), dt)
        dst[0:bg, 1:1 + h2, 0:1, :] = jnp.zeros((bg, h2, 1, lanes_o), dt)
        if cols_tot > 1 + wp_out:
            dst[0:bg, 1:1 + h2, 1 + wp_out:cols_tot, :] = jnp.zeros(
                (bg, h2, cols_tot - 1 - wp_out, lanes_o), dt)

    store_full(oute_ref, oe)
    store_full(outo_ref, oo)


def _fused_stack_kernel(xe_ref, xo_ref, me_ref, mo_ref, b_ref,
                        oute_ref, outo_ref, ae, ao, be, bo, *, meta_e,
                        meta_o, n_layers, h2, wp_out, relus, tail_cut):
    """The ENTIRE uniform conv stack for one batch element, in VMEM.

    Schedule: in -> A -> B -> A -> ... -> out.  The out refs alias the in
    refs (input_output_aliases), read only by layer 0 and written only by
    the last layer, so inter-layer activations never touch HBM; all layer
    weights are resident (tiny Kronecker blocks).
    """
    lanes = oute_ref.shape[-1]

    def store(dst, interior, is4d):
        z = jnp.zeros(dst.shape[1:] if is4d else dst.shape, dst.dtype)
        if is4d:
            dst[0, :, :, :] = z
            dst[0, 1:1 + h2, 1:1 + wp_out, :] = interior.astype(dst.dtype)
        else:
            dst[:, :, :] = z
            dst[1:1 + h2, 1:1 + wp_out, :] = interior.astype(dst.dtype)

    def read(src, is4d, r0, sblk):
        if is4d:
            return src[0, r0:r0 + h2, sblk:sblk + wp_out, :]
        return src[r0:r0 + h2, sblk:sblk + wp_out, :]

    def run_layer(l, se, so, s4, de, do, d4):
        for meta, mref, dst in ((meta_e, me_ref, de), (meta_o, mo_ref, do)):
            acc = jnp.zeros((h2 * wp_out, lanes), jnp.float32)
            for idx, ((src, r0, sblk), _) in enumerate(meta):
                ref = se if src == 0 else so
                blk = read(ref, s4, r0, sblk)
                acc = acc + jnp.dot(blk.reshape(h2 * wp_out, blk.shape[-1]),
                                    mref[l, idx],
                                    preferred_element_type=jnp.float32)
            acc = acc + b_ref[l, :].astype(jnp.float32)
            if relus[l]:
                acc = jnp.maximum(acc, 0.0)
            out = acc.reshape(h2, wp_out, lanes)
            if tail_cut:
                col_ids = lax.broadcasted_iota(jnp.int32, (wp_out, lanes), 0)
                lane_ids = lax.broadcasted_iota(jnp.int32, (wp_out, lanes), 1)
                keep = ~((col_ids == wp_out - 1) & (lane_ids >= tail_cut))
                out = out * keep.astype(out.dtype)[None]
            store(dst, out, d4)

    prev = None  # (se, so, is4d)
    for l in range(n_layers):
        src = (xe_ref, xo_ref, True) if l == 0 else prev
        if l == n_layers - 1:
            dst = (oute_ref, outo_ref, True)
        elif l % 2 == 0:
            dst = (ae, ao, False)
        else:
            dst = (be, bo, False)
        run_layer(l, *src, *dst)
        prev = dst


def hex_conv_stack_pallas(x, kernels, biases=None, *, radius: int,
                          even_odd_offset: int = 0, dilation: int = 1,
                          activation: str = "relu",
                          final_activation: bool = True,
                          fused: bool = False,
                          batch_group: int | None = None,
                          norms=None,
                          band_rows: int | None = None,
                          data_format: str = "NCHW",
                          packed_io: bool = False,
                          image_width: int | None = None,
                          in_channels: int | None = None,
                          extra_input=None):
    """A chain of 'same' hex convolutions fully in the packed domain.

    Packs once, runs every layer as one fused Pallas kernel (all Kronecker
    matmuls + bias + norm + activation from VMEM-resident row planes),
    unpacks once — eliminating the per-layer NCHW<->packed transposes that
    dominate single-op timings.  Semantically equal to chaining
    ``act(norm(hex_conv2d(x, k, padding=radius-1)))`` (tested).

    ``norms`` — optional per-layer normalisation, length ``len(kernels)``;
    each entry one of:

    * ``None`` — no norm;
    * ``("gn", G, gamma, beta)`` — GroupNorm with ``G`` groups and
      per-channel affine params ``(Cout,)``; statistics are computed
      per sample inside the layer kernel (eps 1e-5), so conv->GN->ReLU
      model stages never leave the packed domain;
    * ``("affine", scale, shift)`` — per-channel ``x*scale + shift``
      (e.g. inference-time folded BatchNorm).

    Differentiable: the forward runs the in-place aliased kernels (margins
    persist, no zero-fill); pallas cannot differentiate through aliasing,
    so the custom VJP pulls back through the equivalent pure-XLA packed
    chain (``_stack_xla``, one recomputed forward at grad time — standard
    remat cost).

    Constraints: stride 1, groups 1, all layer widths C with 128 % C == 0
    and C <= 128, even image height, even_odd_offset 0; ``norms`` is not
    supported with ``fused=True`` (the whole-stack fusion was measured
    perf-neutral and stays norm-free).

    ``data_format="NHWC"`` takes/returns (B, H, W, C): the packed plane's
    lane layout IS (pixel-in-group-major, channel-minor), i.e. exactly
    NHWC's (w, c) minor order, so packing from channels-last is a pure
    reshape — the NCHW entry pays a whole-tensor ``moveaxis`` relayout
    per stack call (measured ~1.8 ms at C=32 256^2 b=32 on v5e, more than
    two conv layers' worth; PERF.md fixed-cost decomposition).  Model
    stages that chain stack -> pool -> stack should stay NHWC throughout.

    ``packed_io=True`` takes/returns MARGINED even/odd packed planes
    directly — ``x`` is the ``(xe, xo)`` tuple from :func:`pack_planes`
    (or a previous packed-domain op) and the result is the same tuple
    form; ``image_width`` and ``in_channels`` are then required statics.
    Chaining stack -> :func:`hex_packed_maxpool2` -> stack in this domain
    removes the per-stage unpack/pool/pack round trip entirely.

    ``extra_input`` — a second input image B with the same batch/spatial
    shape as ``x``: the chain is applied to the CHANNEL CONCATENATION
    ``concat([x, extra_input])``, i.e. ``kernels[0]`` has
    ``C_x + C_extra`` input channels, but the concatenation is never
    materialised — layer 0 runs as the fused
    ``conv(A, Ka) + conv(B, Kb)`` split inside the Pallas kernel (the
    decoder skip-join pattern: upsample + skip -> 2W -> W conv).  The
    Pallas path engages when both inputs have the uniform stack width
    (``C_x == C_extra == Cout`` — pad channels to width like the model
    layer does); other splits fall back to the equivalent XLA chain.
    Incompatible with ``packed_io``/``fused``/``band_rows``.
    """
    split = extra_input is not None
    if split and (packed_io or fused or band_rows is not None):
        raise ValueError("extra_input is incompatible with packed_io/"
                         "fused/band_rows")
    if packed_io:
        if image_width is None or in_channels is None:
            raise ValueError("packed_io=True requires image_width and "
                             "in_channels")
        xe, xo = x
        xe, xo = jnp.asarray(xe), jnp.asarray(xo)
        x = (xe, xo)
        batch = xe.shape[0]
    else:
        x = jnp.asarray(x)
        while x.ndim < 4:
            x = x[None]
        batch = x.shape[0]
    if data_format not in ("NCHW", "NHWC"):
        raise ValueError(f"data_format must be NCHW or NHWC, got "
                         f"{data_format!r}")
    nhwc = data_format == "NHWC"
    if even_odd_offset != 0:
        raise ValueError("packed stack assumes offset-0 input (the output "
                         "convention of every op in this framework)")
    if not packed_io and x.shape[1 if nhwc else 2] % 2:
        raise ValueError("even image height required for the packed stack")
    if activation not in ("relu", None, "none"):
        raise ValueError("supported fused activations: 'relu' or None")
    x2 = None
    if split:
        x2 = jnp.asarray(extra_input)
        while x2.ndim < 4:
            x2 = x2[None]
        sp = (slice(1, 3) if nhwc else slice(2, 4))
        if x2.shape[0] != batch or x2.shape[sp] != x.shape[sp]:
            raise ValueError(
                f"extra_input batch/spatial shape {x2.shape} does not "
                f"match x {x.shape}")
    kernels = tuple(jnp.asarray(k) for k in kernels)
    if biases is None:
        biases = (None,) * len(kernels)
    biases = tuple(None if bs is None else jnp.asarray(bs) for bs in biases)
    if batch_group is not None and batch % batch_group:
        raise ValueError(f"batch_group {batch_group} must divide the "
                         f"batch {batch}")
    norm_kinds, norm_arrays = _split_norms(norms, kernels)
    if fused and any(k is not None for k in norm_kinds):
        raise ValueError("norms are not supported with fused=True")
    if packed_io and (band_rows is not None or fused):
        raise ValueError("packed_io is incompatible with band_rows/fused")
    if band_rows is not None:
        if any(k is not None for k in norm_kinds):
            raise ValueError(
                "band_rows is incompatible with norms: GroupNorm needs "
                "whole-image statistics, a band sees only its rows")
        if fused:
            raise ValueError("band_rows is incompatible with fused=True")
        cb = int(x.shape[-1] if nhwc else x.shape[1])
        if cb <= 128 and 128 % cb == 0 and not _same_meta_feasible(
                radius, dilation, 128 // cb):
            raise ValueError(
                f"banded stack does not support radius={radius}, "
                f"dilation={dilation} (the 'same' padding exceeds the "
                f"banded plane margin)")
    else:
        # >VMEM tier: when the full-plane layer kernel's VMEM need (sized
        # exactly as its vmem_limit computation below) cannot fit even at
        # bg=1, auto-route — norm-free uniform stacks to the row-banded
        # kernel (planes stay in HBM, bands stream through VMEM); stacks
        # with norms (whole-image GN stats cannot band) to the pure-XLA
        # packed twin.  At sizes that DO fit, banding is a measured loss
        # (PERF.md round-3 A/B: the per-layer HBM round-trips cost more
        # than the VMEM pressure they relieve), so this only triggers
        # where the full-plane kernel cannot compile at all.
        if packed_io:
            c0 = int(in_channels)
            hh = 2 * (x[0].shape[1] - 1 - _plane_row_margin(radius,
                                                            dilation))
            ww = int(image_width)
            dt_size = x[0].dtype.itemsize
        else:
            c0 = int(x.shape[-1] if nhwc else x.shape[1])
            hh, ww = ((x.shape[1], x.shape[2]) if nhwc
                      else (x.shape[2], x.shape[3]))
            dt_size = x.dtype.itemsize
        chans = {c0} | {int(k.shape[0]) for k in kernels}
        if split:
            c0b = int(x2.shape[-1 if nhwc else 1])
            # the fused split layer requires both inputs at the uniform
            # stack width; other splits run the equivalent XLA chain
            if not (c0b == c0 and len(chans) == 1):
                statics = (radius, dilation, activation, final_activation,
                           fused, batch_group, norm_kinds, None,
                           data_format, None, True)
                return _stack_xla((x, x2), kernels, biases, norm_arrays,
                                  statics)
        if c0 <= 128 and 128 % c0 == 0 and hh % 2 == 0:
            q = 128 // c0
            if not _same_meta_feasible(radius, dilation, q):
                # the folded 'same' padding d*(radius-1) reaches past the
                # plane layout's 1-row/1-col top/left margin (deep
                # dilation/radius): run the equivalent XLA chain
                if packed_io:
                    raise ValueError(
                        f"packed_io planes cannot represent radius="
                        f"{radius}, dilation={dilation} at q={q} (the "
                        f"'same' padding exceeds the plane margin)")
                statics = (radius, dilation, activation, final_activation,
                           fused, batch_group, norm_kinds, None,
                           data_format, None, split)
                return _stack_xla((x, x2) if split else x, kernels,
                                  biases, norm_arrays, statics)
            h2, wp, rows_tot, cols_tot = plane_geometry(
                radius, dilation, q, hh, ww)
            blk = rows_tot * cols_tot * 128 * dt_size
            need = ((6 if split else 4) * blk + 8 * h2 * wp * 128
                    + 16 * 2 ** 20)
            if need > _STACK_VMEM_BUDGET:
                bandable = (len(chans) == 1 and not fused and not packed_io
                            and not split
                            and all(k is None for k in norm_kinds))
                if bandable:
                    band_rows = min(64, h2)
                    if batch_group is None:
                        batch_group = 1
                else:
                    statics = (radius, dilation, activation,
                               final_activation, fused, batch_group,
                               norm_kinds, None, data_format,
                               (int(image_width), int(in_channels))
                               if packed_io else None, split)
                    return _stack_xla((x, x2) if split else x, kernels,
                                      biases, norm_arrays, statics)
    statics = (radius, dilation, activation, final_activation, fused,
               batch_group, norm_kinds, band_rows, data_format,
               (int(image_width), int(in_channels)) if packed_io else None,
               split)
    return _stack_ad((x, x2) if split else x, kernels, biases, norm_arrays,
                     statics)


def _split_norms(norms, kernels):
    """Split the user-facing ``norms`` list into static kinds (hashable,
    part of the custom-vjp statics) and traced affine arrays (diff args)."""
    if norms is None:
        return (None,) * len(kernels), ((),) * len(kernels)
    if len(norms) != len(kernels):
        raise ValueError(f"norms has {len(norms)} entries for "
                         f"{len(kernels)} layers")
    kinds, arrays = [], []
    for i, (n, k) in enumerate(zip(norms, kernels)):
        if n is None:
            kinds.append(None)
            arrays.append(())
        elif n[0] == "gn":
            _, g, gamma, beta = n
            co = int(k.shape[0])
            if co % int(g):
                raise ValueError(f"layer {i}: {g} groups do not divide "
                                 f"{co} channels")
            kinds.append(("gn", int(g)))
            arrays.append((jnp.asarray(gamma), jnp.asarray(beta)))
        elif n[0] == "affine":
            _, scale, shift = n
            kinds.append(("affine",))
            arrays.append((jnp.asarray(scale), jnp.asarray(shift)))
        else:
            raise ValueError(f"unknown norm spec {n!r}")
    return tuple(kinds), tuple(arrays)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _stack_ad(x, kernels, biases, norm_arrays, statics):
    return _stack_impl(x, kernels, biases, norm_arrays, statics)


def _stack_fwd(x, kernels, biases, norm_arrays, statics):
    return _stack_impl(x, kernels, biases, norm_arrays, statics), \
        (x, kernels, biases, norm_arrays)


def _group_norm_nchw(v, groups: int, gamma, beta, eps: float = 1e-5):
    """Plain-XLA per-sample GroupNorm on (B, C, H, W) — the differentiable
    twin of the in-kernel GN (and the reference semantics of flax
    ``GroupNorm`` over channels-last data, ``nn/modules.py:99-104``)."""
    b, c, h, w = v.shape
    g = v.reshape(b, groups, (c // groups) * h * w)
    mean = jnp.mean(g.astype(jnp.float32), axis=-1)
    var = jnp.var(g.astype(jnp.float32), axis=-1)
    mean = jnp.repeat(mean, c // groups, axis=1)[:, :, None, None]
    inv = jnp.repeat(lax.rsqrt(var + eps), c // groups, axis=1)[
        :, :, None, None]
    out = (v.astype(jnp.float32) - mean) * inv
    out = out * gamma[None, :, None, None] + beta[None, :, None, None]
    return out.astype(v.dtype)


def _stack_xla(x, kernels, biases, norm_arrays, statics):
    """Equivalent pure-XLA chain (packed Kronecker einsum per layer) — the
    differentiable twin the custom VJP pulls back through."""
    from ..nn import functional as F
    radius, dilation, activation, final_activation = statics[:4]
    norm_kinds = statics[6]
    nhwc = len(statics) > 8 and statics[8] == "NHWC"
    packed_meta = statics[9] if len(statics) > 9 else None
    split = len(statics) > 10 and statics[10]
    relu = activation == "relu"
    if split:
        # reference semantics of extra_input: the chain applied to the
        # channel concatenation (the fused kernel never materialises it)
        a, bb = x
        if nhwc:
            a, bb = jnp.moveaxis(a, -1, 1), jnp.moveaxis(bb, -1, 1)
        h = jnp.concatenate([a, bb], axis=1)
    elif packed_meta is not None:
        # planes -> image -> chain -> planes, all in differentiable jnp:
        # the custom VJP stays valid for packed_io
        pw, pc = packed_meta
        img = unpack_planes(x, w=pw, cout=pc, radius=radius,
                            dilation=dilation, nhwc=False)
        h = img
    else:
        h = jnp.moveaxis(x, -1, 1) if nhwc else x
    L = len(kernels)
    for i, (k, bs) in enumerate(zip(kernels, biases)):
        h = F.hex_conv2d(h, k, bs, even_odd_offset=0, radius=radius,
                         padding=dilation * (radius - 1), dilation=dilation,
                         impl="packed")
        kind = norm_kinds[i]
        if kind is not None:
            if kind[0] == "gn":
                gamma, beta = norm_arrays[i]
                h = _group_norm_nchw(h, kind[1], gamma, beta)
            else:
                scale, shift = norm_arrays[i]
                h = (h.astype(jnp.float32) * scale[None, :, None, None]
                     + shift[None, :, None, None]).astype(h.dtype)
        if relu and (final_activation or i < L - 1):
            h = jnp.maximum(h, 0)
    if packed_meta is not None:
        return pack_planes(h, radius=radius, dilation=dilation, nhwc=False)
    return jnp.moveaxis(h, 1, -1) if nhwc else h


def _stack_bwd(statics, res, g):
    """Stack pullback.  The Pallas forward kernels cannot be differentiated
    through their in-place aliasing, so the VJP is built by hand (see
    ``_stack_bwd_pallas``): dL/dx is itself a packed-domain 'same' conv
    with slot-transposed metadata, dL/dW is a per-slot ``x_blk^T @ g``
    matmul — both run as one combined Pallas kernel per layer, with the
    bias/GroupNorm/ReLU tail differentiated as a tiny XLA closure.  This
    replaced the round-2 fallback (re-differentiating the equivalent
    pure-XLA packed chain), which ran the whole backward at XLA-twin speed
    (PERF.md: the ~10x train/inference gap's dominant term).  Configs the
    hand path does not cover (banded >VMEM tier, fused=True, non-ReLU
    activations) still pull back through the XLA twin, as does
    ``HYGRID_STACK_BWD=xla``."""
    if _stack_bwd_mode() != "xla":
        out = _stack_bwd_pallas(statics, res, g)
        if out is not None:
            return out
    x, kernels, biases, norm_arrays = res
    _, vjp = jax.vjp(
        lambda xx, kk, bb, nn_: _stack_xla(xx, kk, bb, nn_, statics),
        x, kernels, biases, norm_arrays)
    return vjp(g)


_stack_ad.defvjp(_stack_fwd, _stack_bwd)


def _stack_bwd_mode() -> str:
    import os
    return os.environ.get("HYGRID_STACK_BWD", "auto")


def _phase_meta_transpose(radius: int, d: int, q: int):
    """Adjoint metadata of the packed-domain 'same' conv.

    Mechanical slot-level transpose of :func:`_phase_meta_same`: a forward
    entry reading plane ``src`` at block offset ``(r0, sblk)`` to produce
    output phase ``P`` becomes, in the pullback, an entry reading the
    phase-``P`` cotangent planes at block offset ``(2 - r0, 2 - sblk)``
    (both layouts put the interior base at (1, 1), so a read delta ``t``
    transposes to ``-t``) to produce the plane-``src`` cotangent; slots
    swap their lane groups (``qs <-> qo``) and keep their tap.  Adjoint
    matrices are assembled from the in/out-channel-transposed kernel.

    Returns ``(meta_dxe, meta_dxo, feasible)``; ``feasible`` is False when
    a transposed offset would leave the plane margins (the hex window is
    point-symmetric so in practice it never does, but the check keeps the
    XLA fallback honest rather than miscompiling).
    """
    fwd_e, fwd_o = _phase_meta_same(radius, d, q)
    slots = {0: {}, 1: {}}
    for p, fwd in ((0, fwd_e), (1, fwd_o)):
        for ((src, r0, sblk), entries) in fwd:
            dst = slots[src].setdefault((p, 2 - r0, 2 - sblk), [])
            for (qs, qo, tap) in entries:
                dst.append((qo, qs, tap))
    meta_dxe = sorted((k, sorted(v)) for k, v in slots[0].items())
    meta_dxo = sorted((k, sorted(v)) for k, v in slots[1].items())
    mb, mc = _plane_meta_margins(radius, d, q)
    ok = all(0 <= r <= 1 + mb and 0 <= sb <= 1 + mc
             for m in (meta_dxe, meta_dxo) for ((_p, r, sb), _) in m)
    return meta_dxe, meta_dxo, ok


def _stack_layer_bwd_kernel(xe_ref, xo_ref, ge_ref, go_ref, ae_ref, ao_ref,
                            dxe_ref, dxo_ref, dme_ref, dmo_ref, *,
                            meta_e, meta_o, tmeta_e, tmeta_o, h2: int,
                            wp: int, bg: int, tail_cut: int):
    """Combined per-layer backward: dL/dx AND dL/dM in one kernel.

    Inputs: the layer's saved input planes (xe, xo), the pre-activation
    cotangent planes (ge, go — already pulled back through
    bias/norm/ReLU/mask, so their margins, slack and fake tail lanes are
    zero), and the adjoint Kronecker matrices.  Outputs: the input
    cotangent planes (aliased onto ge/go; all reads complete before the
    stores) and the per-slot weight-gradient blocks ``dme/dmo``, f32,
    accumulated IN VMEM across the sequential batch grid (their out-spec
    maps every grid step to block 0).

    dL/dM_idx = x_blk(idx)^T @ g_interior — the exact transpose of the
    forward's ``x_blk @ M_idx`` — and dL/dx is the adjoint conv over the
    transposed metadata.  Executed-FLOP cost is exactly 2x the forward
    layer, all from VMEM-resident planes (the point: the round-2 XLA-twin
    backward re-read HBM per slot term).
    """
    lanes = dxe_ref.shape[-1]
    n = bg * h2 * wp
    first = pl.program_id(0) == 0

    # ---- dM: one (128, lanes) matmul per forward slot entry ----
    for meta, dmref, gref in ((meta_e, dme_ref, ge_ref),
                              (meta_o, dmo_ref, go_ref)):
        gblk = gref[0:bg, 1:1 + h2, 1:1 + wp, :].reshape(n, lanes)
        for idx, ((src, r0, sblk), _) in enumerate(meta):
            ref = xe_ref if src == 0 else xo_ref
            xblk = ref[0:bg, r0:r0 + h2, sblk:sblk + wp, :].reshape(n, lanes)
            dm = lax.dot_general(xblk, gblk, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

            @pl.when(first)
            def _(dmref=dmref, idx=idx, dm=dm):
                dmref[idx] = dm

            @pl.when(jnp.logical_not(first))
            def _(dmref=dmref, idx=idx, dm=dm):
                dmref[idx] = dmref[idx] + dm

    # ---- dx: the adjoint conv ----
    accs = []
    for tmeta, aref in ((tmeta_e, ae_ref), (tmeta_o, ao_ref)):
        acc = jnp.zeros((n, lanes), jnp.float32)
        for idx, ((gsrc, r0, sblk), _) in enumerate(tmeta):
            ref = ge_ref if gsrc == 0 else go_ref
            blk = ref[0:bg, r0:r0 + h2, sblk:sblk + wp, :]
            acc = acc + jnp.dot(blk.reshape(n, lanes), aref[idx],
                                preferred_element_type=jnp.float32)
        acc = acc.reshape(bg, h2, wp, lanes)
        if tail_cut:
            col_ids = lax.broadcasted_iota(jnp.int32, (wp, lanes), 0)
            lane_ids = lax.broadcasted_iota(jnp.int32, (wp, lanes), 1)
            keep = ~((col_ids == wp - 1) & (lane_ids >= tail_cut))
            acc = acc * keep.astype(acc.dtype)[None, None]
        accs.append(acc)

    # all reads done; write full blocks (same margin discipline as the
    # forward layer kernel — correctness must not depend on the aliasing
    # being physical)
    rows_tot, cols_tot = dxe_ref.shape[1], dxe_ref.shape[2]

    def store_full(dst, val):
        dt = dst.dtype
        dst[0:bg, 1:1 + h2, 1:1 + wp, :] = val.astype(dt)
        dst[0:bg, 0:1] = jnp.zeros((bg, 1, cols_tot, lanes), dt)
        if rows_tot > 1 + h2:
            dst[0:bg, 1 + h2:rows_tot] = jnp.zeros(
                (bg, rows_tot - 1 - h2, cols_tot, lanes), dt)
        dst[0:bg, 1:1 + h2, 0:1, :] = jnp.zeros((bg, h2, 1, lanes), dt)
        if cols_tot > 1 + wp:
            dst[0:bg, 1:1 + h2, 1 + wp:cols_tot, :] = jnp.zeros(
                (bg, h2, cols_tot - 1 - wp, lanes), dt)

    store_full(dxe_ref, accs[0])
    store_full(dxo_ref, accs[1])


def _stack_impl(x, kernels, biases, norm_arrays, statics):
    (radius, dilation, activation, final_activation, fused, batch_group,
     norm_kinds, band_rows) = statics[:8]
    nhwc = len(statics) > 8 and statics[8] == "NHWC"
    packed_meta = statics[9] if len(statics) > 9 else None
    split = len(statics) > 10 and statics[10]
    if band_rows is not None:
        return _stack_impl_banded(x, kernels, biases, statics)
    x_b = None
    if split:
        x, x_b = x
    if packed_meta is not None:
        # planes in / planes out: x is (xe, xo) MARGINED packed planes
        # (the layer kernels' native layout) — no pack/unpack at all.
        # Model pipelines chain stack -> packed pool -> stack entirely in
        # this domain (PERF.md: the per-stage unpack->pool->pack round
        # trip was the dominant fixed cost left after the NHWC entry).
        w, c = packed_meta
        b = x[0].shape[0]
        h2 = x[0].shape[1] - 1 - _plane_row_margin(radius, dilation)
        h = 2 * h2
    elif nhwc:
        b, h, w, c = x.shape
    else:
        b, c, h, w = x.shape
    d = dilation
    relu = activation == "relu"
    kernels = list(kernels)
    biases = list(biases)

    # width bookkeeping: 'same' conv keeps W; pack W with one zero packed
    # column on each side (left for negative shifts, right for positive)
    chans = [c] + [int(k.shape[0]) for k in kernels]
    for ci in chans:
        if not (ci <= 128 and 128 % ci == 0):
            raise ValueError(f"channel width {ci} unsupported by packed stack")
    h2 = h // 2

    # uniform-width stack: every layer shares the same packing and the same
    # static margins (1 zero row top / 1 zero packed col left, slack at
    # bottom/right sized by the metas), so layer outputs are emitted in the
    # margined layout directly and chain with zero host-side repadding
    qi = 128 // chans[0]
    h2, wp, rows_tot, cols_tot = plane_geometry(radius, d, qi, h, w)
    if packed_meta is not None:
        xe, xo = x
        if xe.shape[1:] != (rows_tot, cols_tot, 128):
            raise ValueError(
                f"packed planes shape {xe.shape[1:]} does not match the "
                f"(radius={radius}, q={qi}) layout "
                f"{(rows_tot, cols_tot, 128)}")
        dtype = xe.dtype
    else:
        # pack (NHWC entry: pure reshape; NCHW pays a moveaxis relayout —
        # measured ~1.8 ms at C=32 256^2 b=32, PERF.md fixed-cost table)
        xe, xo = pack_planes(x, radius=radius, dilation=d, nhwc=nhwc)
        dtype = x.dtype
    if split:
        xe2, xo2 = pack_planes(x_b, radius=radius, dilation=d, nhwc=nhwc)

    uniform = all(c == chans[0] for c in chans)
    if fused and uniform and len(kernels) >= 2:
        c0 = chans[0]
        q0 = 128 // c0
        wp_out = -(-w // q0)
        meta_e, meta_o = _phase_meta_same(radius, d, q0)
        me_all = jnp.stack([_assemble_mats(k, meta_e, q0, c0, c0, dtype)
                            for k in kernels])
        mo_all = jnp.stack([_assemble_mats(k, meta_o, q0, c0, c0, dtype)
                            for k in kernels])
        bias_all = jnp.stack([
            (jnp.tile(bs, q0) if bs is not None
             else jnp.zeros((q0 * c0,), dtype)).astype(dtype)
            for bs in biases])
        L = len(kernels)
        relus = tuple(relu and (final_activation or li < L - 1)
                      for li in range(L))
        tail_cut = (w % q0) * c0 if (w % q0) else 0
        kfn = functools.partial(
            _fused_stack_kernel, meta_e=meta_e, meta_o=meta_o, n_layers=L,
            h2=h2, wp_out=wp_out, relus=relus, tail_cut=tail_cut)
        n_mats = len(meta_e)
        xe, xo = pl.pallas_call(
            kfn,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, rows_tot, cols_tot, 128),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_tot, cols_tot, 128),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, n_mats, 128, q0 * c0),
                             lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, len(meta_o), 128, q0 * c0),
                             lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, q0 * c0), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, rows_tot, cols_tot, 128),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_tot, cols_tot, 128),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, rows_tot, cols_tot, 128), dtype),
                jax.ShapeDtypeStruct((b, rows_tot, cols_tot, 128), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_tot, cols_tot, 128), dtype),
                pltpu.VMEM((rows_tot, cols_tot, 128), dtype),
                pltpu.VMEM((rows_tot, cols_tot, 128), dtype),
                pltpu.VMEM((rows_tot, cols_tot, 128), dtype),
            ],
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(30 * 2 ** 20)),
            interpret=jax.default_backend() != "tpu",
        )(xe, xo, me_all, mo_all, bias_all)
        kernels = []  # layers consumed by the fused kernel

    for li, kern in enumerate(kernels):
        cin = chans[li]
        cout = chans[li + 1]
        qin = 128 // cin
        qout = 128 // cout
        if qout != qin:
            raise NotImplementedError(
                "mixed channel widths in one packed stack not supported yet")
        wp_out = -(-w // qout)
        meta_e, meta_o = _phase_meta_same(radius, d, qin)

        is_split = split and li == 0
        if is_split:
            if int(kern.shape[1]) != 2 * cin:
                raise ValueError(
                    f"split layer-0 kernel needs {2 * cin} input channels "
                    f"(both halves at the stack width), got {kern.shape[1]}")
            ka, kb = kern[:, :cin], kern[:, cin:]
        else:
            ka, kb = kern, None
        me = _assemble_mats(ka, meta_e, qin, cin, cout, dtype)
        mo = _assemble_mats(ka, meta_o, qin, cin, cout, dtype)
        if is_split:
            me2 = _assemble_mats(kb, meta_e, qin, cin, cout, dtype)
            mo2 = _assemble_mats(kb, meta_o, qin, cin, cout, dtype)
        has_bias = biases[li] is not None
        bvec = (jnp.tile(biases[li], qout) if has_bias
                else jnp.zeros((qout * cout,), dtype))[None]

        kind = norm_kinds[li]
        norm = gn_groups = None
        if kind is not None:
            norm = kind[0]
            gn_groups = kind[1] if norm == "gn" else 1
            a0, a1 = norm_arrays[li]
            nbvec = jnp.stack([jnp.tile(a0.astype(jnp.float32), qout),
                               jnp.tile(a1.astype(jnp.float32), qout)])
        else:
            nbvec = jnp.zeros((2, qout * cout), jnp.float32)

        tail_cut = (w % qout) * cout if (w % qout) else 0

        layer_relu = relu and (final_activation or li < len(kernels) - 1)
        blk_bytes = rows_tot * cols_tot * 128 * dtype.itemsize
        if batch_group is not None:
            bg = batch_group
        else:
            # bg=2 measured best END-TO-END on v5e (PERF.md): bg=8 wins the
            # isolated stack micro-bench 31% (M=32K-row matmuls) but its
            # ~86 MB VMEM footprint starves overlap with neighbouring
            # kernels and loses ~9% on the full pipeline — keep the small
            # default, override via ``batch_group`` for stack-only runs
            bg = 1
            for cand in (4, 2):
                if b % cand == 0 and blk_bytes * cand <= 2 ** 22:
                    bg = cand
                    break
        kfn = functools.partial(
            _stack_layer_kernel, meta_e=meta_e, meta_o=meta_o, h2=h2,
            wp_out=wp_out, relu=layer_relu, has_bias=has_bias,
            tail_cut=tail_cut, bg=bg, norm=norm,
            gn_groups=gn_groups or 1, c_out=cout, n_pixels=h * w,
            split=is_split)
        plane_spec = pl.BlockSpec((bg, rows_tot, cols_tot, 128),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        mats_e_spec = pl.BlockSpec((len(meta_e), 128, qout * cout),
                                   lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
        mats_o_spec = pl.BlockSpec((len(meta_o), 128, qout * cout),
                                   lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
        in_specs = [plane_spec, plane_spec]
        inputs = [xe, xo]
        if is_split:
            in_specs += [plane_spec, plane_spec]
            inputs += [xe2, xo2]
        in_specs += [mats_e_spec, mats_o_spec]
        inputs += [me, mo]
        if is_split:
            in_specs += [mats_e_spec, mats_o_spec]
            inputs += [me2, mo2]
        in_specs += [
            pl.BlockSpec((1, qout * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, qout * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [bvec, nbvec]
        xe, xo = pl.pallas_call(
            kfn,
            grid=(b // bg,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bg, rows_tot, cols_tot, 128),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, rows_tot, cols_tot, 128),
                             lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, rows_tot, cols_tot, 128), dtype),
                jax.ShapeDtypeStruct((b, rows_tot, cols_tot, 128), dtype),
            ],
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(110 * 2 ** 20, max(
                    28 * 2 ** 20,
                    # aliased block pair (double-buffered) + f32 phase accs
                    # + the read-only B planes when split
                    # + slack for Mosaic temporaries AND for buffers XLA's
                    # memory-space-assignment pass promotes to VMEM around
                    # this call: MSA charges its S(1) placements against
                    # this limit and hard-errors the compile when they
                    # exceed it (observed under jvp at b=32: kernel ~33 MB
                    # + ~15 MB of promoted planes).  Correctness never
                    # depends on the placements (margins are re-zeroed
                    # in-kernel), so headroom is safe — measured neutral
                    # end-to-end.
                    (6 if is_split else 4) * blk_bytes * bg
                    + 8 * bg * h2 * wp_out * 128
                    + 48 * 2 ** 20)))),
            interpret=jax.default_backend() != "tpu",
        )(*inputs)
        wp = wp_out

    if packed_meta is not None:
        return xe, xo
    return unpack_planes((xe, xo), w=w, cout=chans[-1], radius=radius,
                         dilation=d, nhwc=nhwc)


# ---------------------------------------------------------------------------
# Hand-written stack backward (round 3): Pallas dL/dx + dL/dW per layer.
# ---------------------------------------------------------------------------

def _interior_mask_np(rows_tot: int, cols_tot: int, h2: int, wp: int,
                      tail_cut: int):
    """(rows_tot, cols_tot, 128) f32: 1 at interior real pixels, 0 at the
    margins/slack and at the fake tail lanes of the last packed column —
    the trace-time constant the post closures mask with (exactly the
    positions the layer kernels zero in-kernel)."""
    import numpy as _np
    m = _np.zeros((rows_tot, cols_tot, 128), _np.float32)
    m[1:1 + h2, 1:1 + wp, :] = 1.0
    if tail_cut:
        m[1:1 + h2, wp, tail_cut:] = 0.0
    return m


def _make_post(kind, relu_i: bool, cout: int, q: int, n_pixels: int, mask,
               dtype):
    """The differentiable tail of one stack layer, on margined planes:
    ``planes = mask * act(norm((pre + bias) * mask))`` — bit-matching the
    fused kernel's epilogue (tail mask before GN statistics, exact valid
    count, eps 1e-5, re-mask after the norm's shift).  ``jax.vjp`` of this
    closure yields the pre-activation cotangent plus d(bias)/d(gamma)/
    d(beta); the conv itself is pulled back by the Pallas bwd kernel."""
    def post(pre_pair, bvec, arrs):
        pe, po = pre_pair
        f32 = jnp.float32
        ze = (pe.astype(f32) + bvec) * mask
        zo = (po.astype(f32) + bvec) * mask
        if kind is not None and kind[0] == "gn":
            groups = kind[1]
            gamma, beta = arrs
            cpg = cout // groups
            import numpy as _np
            lane_g = (_np.arange(128) % cout) // cpg
            onehot = jnp.asarray(
                (lane_g[None, :] == _np.arange(groups)[:, None])
                .astype(_np.float32))                       # (G, 128)
            cnt = float(n_pixels * cpg)
            s = ze.sum((1, 2)) + zo.sum((1, 2))             # (b, 128)
            ss = (ze * ze).sum((1, 2)) + (zo * zo).sum((1, 2))
            mu = (s @ onehot.T) / cnt                       # (b, G)
            var = jnp.maximum((ss @ onehot.T) / cnt - mu * mu, 0.0)
            inv = lax.rsqrt(var + 1e-5)
            mu_l = mu @ onehot                              # (b, 128)
            inv_l = inv @ onehot
            gamma_l = jnp.tile(gamma.astype(f32), q)
            beta_l = jnp.tile(beta.astype(f32), q)
            scale = inv_l * gamma_l[None]
            shift = beta_l[None] - mu_l * scale
            ze = ze * scale[:, None, None, :] + shift[:, None, None, :]
            zo = zo * scale[:, None, None, :] + shift[:, None, None, :]
        elif kind is not None:                              # "affine"
            scale, shift = arrs
            scale_l = jnp.tile(scale.astype(f32), q)[None, None, None]
            shift_l = jnp.tile(shift.astype(f32), q)[None, None, None]
            ze = ze * scale_l + shift_l
            zo = zo * scale_l + shift_l
        if relu_i:
            ze = jnp.maximum(ze, 0.0)
            zo = jnp.maximum(zo, 0.0)
        ze = ze * mask
        zo = zo * mask
        return ze.astype(dtype), zo.astype(dtype)
    return post


def _launch_layer_pre(planes, me, mo, *, meta_e, meta_o, h2, wp, rows_tot,
                      cols_tot, bg, tail_cut, dtype, planes_b=None,
                      me2=None, mo2=None):
    """Forward recompute of ONE layer's raw conv pre-activation (no bias /
    norm / activation) via the standard layer kernel — un-aliased: the
    input planes stay live (the bwd kernel needs them for dL/dW)."""
    lanes = 128
    split = planes_b is not None
    kfn = functools.partial(
        _stack_layer_kernel, meta_e=meta_e, meta_o=meta_o, h2=h2,
        wp_out=wp, relu=False, has_bias=False, tail_cut=tail_cut, bg=bg,
        norm=None, gn_groups=1, c_out=0, n_pixels=0, split=split)
    b = planes[0].shape[0]
    blk_bytes = rows_tot * cols_tot * lanes * dtype.itemsize
    plane_spec = pl.BlockSpec((bg, rows_tot, cols_tot, lanes),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((len(meta_e), lanes, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec_o = pl.BlockSpec((len(meta_o), lanes, lanes), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [plane_spec, plane_spec]
    inputs = [planes[0], planes[1]]
    if split:
        in_specs += [plane_spec, plane_spec]
        inputs += [planes_b[0], planes_b[1]]
    in_specs += [mspec, mspec_o]
    inputs += [me, mo]
    if split:
        in_specs += [mspec, mspec_o]
        inputs += [me2, mo2]
    in_specs += [
        pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [jnp.zeros((1, lanes), dtype), jnp.zeros((2, lanes),
                                                       jnp.float32)]
    return pl.pallas_call(
        kfn,
        grid=(b // bg,),
        in_specs=in_specs,
        out_specs=[plane_spec, plane_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows_tot, cols_tot, lanes), dtype),
            jax.ShapeDtypeStruct((b, rows_tot, cols_tot, lanes), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(110 * 2 ** 20, max(
                28 * 2 ** 20,
                (6 if split else 4) * blk_bytes * bg
                + 8 * bg * h2 * wp * lanes + 48 * 2 ** 20)))),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def _launch_layer_bwd(x_planes, g_planes, kern, *, radius, d, q, cin, cout,
                      h2, wp, rows_tot, cols_tot, bg, tail_cut, dtype):
    """dL/dx (planes) and dL/dkernel for one layer via the combined
    Pallas bwd kernel; the dM Kronecker blocks are folded back to the flat
    hex tap layout at trace level."""
    lanes = 128
    meta_e, meta_o = _phase_meta_same(radius, d, q)
    tmeta_e, tmeta_o, ok = _phase_meta_transpose(radius, d, q)
    assert ok  # caller verified feasibility
    kt = jnp.transpose(kern, (1, 0, 2))
    ae = _assemble_mats(kt, tmeta_e, q, cout, cin, dtype)
    ao = _assemble_mats(kt, tmeta_o, q, cout, cin, dtype)
    b = x_planes[0].shape[0]
    blk_bytes = rows_tot * cols_tot * lanes * dtype.itemsize
    kfn = functools.partial(
        _stack_layer_bwd_kernel, meta_e=meta_e, meta_o=meta_o,
        tmeta_e=tmeta_e, tmeta_o=tmeta_o, h2=h2, wp=wp, bg=bg,
        tail_cut=tail_cut)
    plane_spec = pl.BlockSpec((bg, rows_tot, cols_tot, lanes),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    def mspec(n):
        return pl.BlockSpec((n, lanes, lanes), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    dxe, dxo, dme, dmo = pl.pallas_call(
        kfn,
        grid=(b // bg,),
        in_specs=[plane_spec, plane_spec, plane_spec, plane_spec,
                  mspec(len(tmeta_e)), mspec(len(tmeta_o))],
        out_specs=[plane_spec, plane_spec,
                   mspec(len(meta_e)), mspec(len(meta_o))],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows_tot, cols_tot, lanes), dtype),
            jax.ShapeDtypeStruct((b, rows_tot, cols_tot, lanes), dtype),
            jax.ShapeDtypeStruct((len(meta_e), lanes, lanes), jnp.float32),
            jax.ShapeDtypeStruct((len(meta_o), lanes, lanes), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(110 * 2 ** 20, max(
                28 * 2 ** 20,
                6 * blk_bytes * bg + 8 * bg * h2 * wp * lanes
                + 48 * 2 ** 20)))),
        interpret=jax.default_backend() != "tpu",
    )(x_planes[0], x_planes[1], g_planes[0], g_planes[1], ae, ao)
    dk = _fold_dmats(dme, dmo, meta_e, meta_o, q, cin, cout)
    return (dxe, dxo), dk


def _fold_dmats(dme, dmo, meta_e, meta_o, q: int, c: int, co: int):
    """Fold the per-slot dM Kronecker blocks back to the flat hex kernel
    gradient (Cout, Cin, taps) — the trace-time transpose of
    :func:`_assemble_mats`'s scatter."""
    import numpy as _np
    n_taps = max(tap for m in (meta_e, meta_o)
                 for (_, entries) in m for (_qs, _qo, tap) in entries) + 1
    parts = []
    for meta, dm in ((meta_e, dme), (meta_o, dmo)):
        idxs, qss, qos, taps = [], [], [], []
        for idx, (_, entries) in enumerate(meta):
            for (qs, qo, tap) in entries:
                idxs.append(idx)
                qss.append(qs)
                qos.append(qo)
                taps.append(tap)
        dm5 = dm.reshape(len(meta), q, c, q, co)
        blocks = dm5[_np.asarray(idxs), _np.asarray(qss), :,
                     _np.asarray(qos), :]                   # (E, c, co)
        onehot = jnp.asarray(_np.eye(n_taps, dtype=_np.float32)[
            _np.asarray(taps)])                             # (E, n_taps)
        parts.append(jnp.einsum("ecd,et->dct", blocks, onehot))
    return parts[0] + parts[1]


def _stack_bwd_pallas(statics, res, g):
    """Hand-written pullback of ``_stack_impl`` (see ``_stack_bwd``).
    Returns None for configs it does not cover (the caller then falls
    back to re-differentiating the XLA twin)."""
    (radius, dilation, activation, final_activation, fused, batch_group,
     norm_kinds, band_rows) = statics[:8]
    nhwc = len(statics) > 8 and statics[8] == "NHWC"
    packed_meta = statics[9] if len(statics) > 9 else None
    split = len(statics) > 10 and statics[10]
    if fused or band_rows is not None:
        return None
    if activation not in ("relu", None, "none"):
        return None
    x, kernels, biases, norm_arrays = res
    x_b = None
    if split:
        x, x_b = x
    d = dilation
    if packed_meta is not None:
        w, c0 = int(packed_meta[0]), int(packed_meta[1])
        h2 = x[0].shape[1] - 1 - _plane_row_margin(radius, d)
        h = 2 * h2
        dtype = x[0].dtype
    elif nhwc:
        _, h, w, c0 = x.shape
        dtype = x.dtype
    else:
        _, c0, h, w = x.shape
        dtype = x.dtype
    chans = [int(c0)] + [int(k.shape[0]) for k in kernels]
    if any(not (ci <= 128 and 128 % ci == 0) for ci in chans):
        return None
    if len({128 // ci for ci in chans}) != 1:
        return None
    q = 128 // chans[0]
    _, _, t_ok = _phase_meta_transpose(radius, d, q)
    if not t_ok:
        return None
    h2, wp, rows_tot, cols_tot = plane_geometry(radius, d, q, h, w)
    blk_bytes = rows_tot * cols_tot * 128 * dtype.itemsize
    if 6 * blk_bytes + 8 * h2 * wp * 128 + 16 * 2 ** 20 > _STACK_VMEM_BUDGET:
        return None

    bg = 1
    b = x[0].shape[0] if packed_meta is not None else x.shape[0]
    for cand in (4, 2):
        if b % cand == 0 and 2 * blk_bytes * cand <= 2 ** 22:
            bg = cand
            break

    meta_e, meta_o = _phase_meta_same(radius, d, q)
    tail_cut = (w % q) * chans[0] if (w % q) else 0
    mask = jnp.asarray(_interior_mask_np(rows_tot, cols_tot, h2, wp,
                                         tail_cut))
    relu = activation == "relu"
    L = len(kernels)

    # ---- forward recompute: Pallas pre-activations + differentiable
    # post closures (jax.vjp evaluates the forward NOW and hands back the
    # pullback for the reverse sweep) ----
    if packed_meta is not None:
        planes = (jnp.asarray(x[0]), jnp.asarray(x[1]))
    else:
        planes = pack_planes(x, radius=radius, dilation=d, nhwc=nhwc)
    planes_b = None
    if split:
        planes_b = pack_planes(x_b, radius=radius, dilation=d, nhwc=nhwc)

    xs = [planes]
    posts = []
    for li, kern in enumerate(kernels):
        cin, cout = chans[li], chans[li + 1]
        is_split = split and li == 0
        if is_split:
            ka, kb = kern[:, :cin], kern[:, cin:]
        else:
            ka, kb = kern, None
        me = _assemble_mats(ka, meta_e, q, cin, cout, dtype)
        mo = _assemble_mats(ka, meta_o, q, cin, cout, dtype)
        me2 = mo2 = None
        if is_split:
            me2 = _assemble_mats(kb, meta_e, q, cin, cout, dtype)
            mo2 = _assemble_mats(kb, meta_o, q, cin, cout, dtype)
        pre = _launch_layer_pre(
            xs[li], me, mo, meta_e=meta_e, meta_o=meta_o, h2=h2, wp=wp,
            rows_tot=rows_tot, cols_tot=cols_tot, bg=bg, tail_cut=tail_cut,
            dtype=dtype, planes_b=planes_b if is_split else None,
            me2=me2, mo2=mo2)
        layer_relu = relu and (final_activation or li < L - 1)
        post = _make_post(norm_kinds[li], layer_relu, cout, q, h * w, mask,
                          dtype)
        bvec = (jnp.tile(biases[li].astype(jnp.float32), q)
                if biases[li] is not None else jnp.zeros((128,),
                                                         jnp.float32))
        arrs = norm_arrays[li]
        xnext, vjp_fn = jax.vjp(post, pre, bvec, arrs)
        posts.append(vjp_fn)
        xs.append(xnext)

    # ---- cotangent entry ----
    if packed_meta is not None:
        gp = (jnp.asarray(g[0]) * mask.astype(dtype),
              jnp.asarray(g[1]) * mask.astype(dtype))
    else:
        gp = pack_planes(g, radius=radius, dilation=d, nhwc=nhwc)

    dkernels, dbiases, dnorms = [None] * L, [None] * L, [None] * L
    dx_b = None
    for li in reversed(range(L)):
        cin, cout = chans[li], chans[li + 1]
        gpre, dbvec, darrs = posts[li](gp)
        dnorms[li] = darrs
        if biases[li] is not None:
            dbiases[li] = dbvec.reshape(q, cout).sum(0).astype(
                biases[li].dtype)
        kern = kernels[li]
        is_split = split and li == 0
        if is_split:
            ka, kb = kern[:, :cin], kern[:, cin:]
            gp, dka = _launch_layer_bwd(
                xs[li], gpre, ka, radius=radius, d=d, q=q, cin=cin,
                cout=cout, h2=h2, wp=wp, rows_tot=rows_tot,
                cols_tot=cols_tot, bg=bg, tail_cut=tail_cut, dtype=dtype)
            dxb_planes, dkb = _launch_layer_bwd(
                planes_b, gpre, kb, radius=radius, d=d, q=q, cin=cin,
                cout=cout, h2=h2, wp=wp, rows_tot=rows_tot,
                cols_tot=cols_tot, bg=bg, tail_cut=tail_cut, dtype=dtype)
            dkernels[li] = jnp.concatenate([dka, dkb], axis=1).astype(
                kern.dtype)
            dx_b = unpack_planes(dxb_planes, w=w, cout=cin, radius=radius,
                                 dilation=d, nhwc=nhwc).astype(x_b.dtype)
        else:
            gp, dk = _launch_layer_bwd(
                xs[li], gpre, kern, radius=radius, d=d, q=q, cin=cin,
                cout=cout, h2=h2, wp=wp, rows_tot=rows_tot,
                cols_tot=cols_tot, bg=bg, tail_cut=tail_cut, dtype=dtype)
            dkernels[li] = dk.astype(kern.dtype)

    if packed_meta is not None:
        dx = (gp[0].astype(dtype), gp[1].astype(dtype))
    else:
        dx = unpack_planes(gp, w=w, cout=chans[0], radius=radius,
                           dilation=d, nhwc=nhwc).astype(x.dtype)
    if split:
        dx = (dx, dx_b)
    return (dx, tuple(dkernels), tuple(dbiases), tuple(dnorms))
