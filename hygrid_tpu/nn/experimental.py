"""Archived / experimental hex ops (SURVEY.md C22).

The reference keeps a tier of ops out of the importable package, archived in
``codes in old versions.txt``: learned hex<->rect resampling convs, hex
transposed conv, hex pixel shuffle, quadtree/diamond pooling, an im2col
reference conv, and unfold helpers.  They encode design intent (upsampling
and cross-lattice layers for dense prediction models), so this module makes
them first-class — rebuilt on jax with the archive's exact semantics and
the archive's latent bugs fixed (noted per function).

All functions take (B, C, H, W); classes follow the archive constructors.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .functional import (pad2d, _hex_kernel_rows, _merge_phases, _conv,
                         _mm_lane, _reduction)
from ..ops.convert import heximage_to_type1, type1_to_heximage

__all__ = [
    "hex_to_square_downsample_weight",
    "square_downsample_weight",
    "diamond_weight",
    "hex_to_square_conv2d_by_double_stride",
    "square_to_hex_conv2d_by_double_stride",
    "hex_conv_transpose2d",
    "hex_pixel_shuffle",
    "quadtree_hex_pooling",
    "diamond_hex_pooling",
    "hex_to_square_original_resolution",
    "im2col_hex_conv2d",
    "hex_im2col",
    "pixel_even_row_quadtree_unfold",
    "pixel_even_row_dimond_unfold_1",
    "pixel_even_row_square_unfold",
]


# ----------------------- bilinear-style init weights -----------------------

def hex_to_square_downsample_weight(channels: int, f: int) -> jnp.ndarray:
    """Inverse-distance weights on the hex lattice for a learned hex->rect
    downsample (archive ``generate_weight``, codes:35-48). (C, f, f)."""
    x = np.arange(f, dtype=np.float64)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    dist = 1.0 / np.sqrt((xx - (f - 1) / 2) ** 2 +
                         (0.5 * xx + yy - 3 * (f - 1) / 4) ** 2)
    w = dist / dist.sum()
    return jnp.asarray(np.broadcast_to(w, (channels, f, f)), jnp.float32)


def square_downsample_weight(channels: int, f: int) -> jnp.ndarray:
    """Rect-lattice analogue (codes:445-457). (C, f*f)."""
    x = np.arange(f, dtype=np.float64)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    dist = 1.0 / np.sqrt((xx - (f - 1) / 2) ** 2 + (yy - (f - 1) / 2) ** 2)
    w = dist / dist.sum()
    return jnp.asarray(np.broadcast_to(w.reshape(-1), (channels, f * f)),
                       jnp.float32)


def diamond_weight(channels: int, f: int = 2) -> jnp.ndarray:
    """2x2 diamond-cell weights (codes:614-621). (C, f*f)."""
    x = np.arange(f, dtype=np.float64)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    dist = 1.0 / np.sqrt((xx + yy - (f - 1)) ** 2 +
                         (0.5 * xx - 0.5 * yy) ** 2)
    w = dist / dist.sum()
    return jnp.asarray(np.broadcast_to(w.reshape(-1), (channels, f * f)),
                       jnp.float32)


# ------------------------- cross-lattice resampling ------------------------

def hex_to_square_conv2d_by_double_stride(x, kernel, *,
                                          even_odd_offset: int = 0,
                                          padding: int = 0,
                                          padding_mode: str = "constant",
                                          padding_value=0):
    """Learned hex->rect downsample (archive codes:1-66).

    ``kernel``: (C, f, f) per-channel weights (depthwise); the downsample
    factor f must be even.  Scatters row i's taps at type-1 columns
    ``i + 2k`` and runs one even-phase depthwise conv with stride
    (f, 2f - 1).
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    kernel = jnp.asarray(kernel)
    c, f, _ = kernel.shape
    if f % 2:
        raise ValueError("downsample factor must be even")
    k_h, k_w = f, 3 * f - 2
    weight = jnp.zeros((c, 1, k_h, k_w), kernel.dtype)
    for i in range(k_h):
        weight = weight.at[:, 0, i, i:i + (k_h - 1) * 2 + 1:2].add(kernel[:, i, :])
    x = pad2d(x, padding, padding_mode, padding_value)
    parity = (even_odd_offset + padding) % 2
    t1 = heximage_to_type1(x, parity)
    sl = t1[:, :, :, 1:None if parity % 2 == 0 else -1]
    return _conv(sl.astype(weight.dtype), weight, (f, 2 * f - 1), c)


def square_to_hex_conv2d_by_double_stride(x, kernel, *, padding: int = 0,
                                          padding_mode: str = "constant",
                                          padding_value=0):
    """Learned rect->hex downsample (archive codes:421-493).

    ``kernel``: (C, f*f); even output rows pool aligned fxf windows, odd
    rows the half-cell-shifted ones, interleaved — a learned version of
    ``rect_to_hex_resample``'s half-resolution default.
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    kernel = jnp.asarray(kernel)
    c, ksq = kernel.shape
    f = int(round(math.sqrt(ksq)))
    x = pad2d(x, padding, padding_mode, padding_value)
    even = pixel_even_row_square_unfold(x[:, :, :, :-(f // 2)], f)
    odd = pixel_even_row_square_unfold(x[:, :, f:, (f // 2):], f)
    evenconv = jnp.einsum("bchwk,ck->bchw", even.astype(kernel.dtype), kernel)
    oddconv = jnp.einsum("bchwk,ck->bchw", odd.astype(kernel.dtype), kernel)
    return _merge_phases(evenconv, oddconv, None)


def hex_conv_transpose2d(x, kernel, bias=None, *, even_odd_offset: int = 0,
                         radius: int, stride: int = 1, groups: int = 1,
                         impl: str = "auto", data_format: str = "NCHW"):
    """Hex transposed convolution (archive codes:129-274).

    Semantics: zero-stuff the input onto an upsampled type-1 canvas
    (``input_interpolation``, codes:186-205), pad by ``radius - 1``, then
    run the standard dual-phase conv with stride (2, 2).
    ``kernel``: (O, C // groups, kernelnum).

    ``impl="canvas"`` executes that literally.  ``impl="phase"`` runs the
    numerically-derived phase decomposition instead: the canvas is
    ~``1/stride^2`` dense, so the canvas conv spends ~75% of its MACs on
    structural zeros at stride 2 — the phase path regroups the taps that
    ever hit data into per-output-phase sub-kernels applied DIRECTLY to
    the un-stuffed input (no canvas materialisation, no zero MACs),
    bit-equal by construction and tested against the canvas path.

    ``impl="matmul"`` evaluates the same phase plan as ONE tap matmul
    plus reshape interleaves (see :func:`_hex_conv_transpose2d_matmul`).
    Both executors measured within the same ~3-6 ms band on the HexUNet
    decoder sizes on v5e — the op is XLA-relayout-bound, not FLOP-bound —
    and the matmul executor's *backward* is much worse (strided-slice
    VJPs lower to interior-pad scatter-adds), so ``"auto"`` stays on
    ``"phase"`` (measured refusal, PERF.md round 3).

    ``data_format="NHWC"`` takes and returns channels-last without the
    wrapper transposes (the layout the matmul path uses internally).
    """
    if impl not in ("auto", "matmul", "phase", "canvas"):
        raise ValueError(f"unknown impl {impl!r}")
    if data_format not in ("NCHW", "NHWC"):
        raise ValueError(f"unknown data_format {data_format!r}")
    nhwc = data_format == "NHWC"
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    if impl != "canvas":
        h, w = (x.shape[1], x.shape[2]) if nhwc else (x.shape[2], x.shape[3])
        s, r = stride, radius
        p = r - 1
        h1p = s * h - s + 1 + 2 * p
        w1p = 2 * s * w - s + 2 + (1 - s % 2) + 4 * p
        he = (h1p - (2 * r - 1)) // 2 + 1
        ho = (h1p - s - (2 * r - 1)) // 2 + 1
        wo = (w1p - 1 - s - (4 * r - 3)) // 2 + 1
        if he > 0 and ho > 0 and wo > 0:
            if impl == "matmul":
                xl = x if nhwc else jnp.moveaxis(x, 1, -1)
                out = _hex_conv_transpose2d_matmul(
                    xl, kernel, bias, even_odd_offset=even_odd_offset,
                    radius=radius, stride=stride, groups=groups)
                return out if nhwc else jnp.moveaxis(out, -1, 1)
            out = _hex_conv_transpose2d_phase(
                jnp.moveaxis(x, -1, 1) if nhwc else x, kernel, bias,
                even_odd_offset=even_odd_offset, radius=radius,
                stride=stride, groups=groups)
            return jnp.moveaxis(out, 1, -1) if nhwc else out
        if impl in ("phase", "matmul"):
            raise ValueError(f"input too small for the {impl} path; use "
                             "impl='canvas'")
    out = _hex_conv_transpose2d_canvas(
        jnp.moveaxis(x, -1, 1) if nhwc else x, kernel, bias,
        even_odd_offset=even_odd_offset, radius=radius, stride=stride,
        groups=groups)
    return jnp.moveaxis(out, 1, -1) if nhwc else out


def _hex_conv_transpose2d_canvas(x, kernel, bias=None, *,
                                 even_odd_offset: int = 0, radius: int,
                                 stride: int = 1, groups: int = 1):
    """The literal canvas formulation (archive codes:129-274)."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    kernel = jnp.asarray(kernel)
    b, c, h, w = x.shape
    s, r = stride, radius
    ks = 2 * r - 1
    k_h, k_w = ks, 4 * r - 3

    # input_interpolation (codes:186-205): duplicate each pixel at two
    # adjacent columns on an s-dilated type-1 canvas
    w1 = 2 * s * w - s + 2 + (1 - s % 2)
    h1 = s * h - s + 1
    canvas = jnp.zeros((b, c, h1, w1), x.dtype)
    off = even_odd_offset
    ev = x[:, :, 0::2, :]
    od = x[:, :, 1::2, :]
    # each pixel lands on two adjacent columns of the s-dilated type-1
    # canvas; explicit slot counts (the archive's open-ended slices only
    # line up for offset=1, codes:194-202 — fixed intent)
    for delta in (0, 1):
        col0 = off * s + delta
        canvas = canvas.at[:, :, 0:2 * s * (ev.shape[2] - 1) + 1:2 * s,
                           col0:col0 + 2 * s * (w - 1) + 1:2 * s].set(ev)
        col1 = (1 - off) * s + delta
        if od.shape[2] > 0:
            canvas = canvas.at[:, :, s:s + 2 * s * (od.shape[2] - 1) + 1:2 * s,
                               col1:col1 + 2 * s * (w - 1) + 1:2 * s].set(od)
    p = r - 1
    canvas = pad2d(canvas, (2 * p, 2 * p, p, p))

    weight = jnp.zeros((kernel.shape[0], c // groups, k_h, k_w), kernel.dtype)
    for (i, t, ln, start) in _hex_kernel_rows(r):
        weight = weight.at[:, :, i, t:t + (ln - 1) * 2 + 1:2].add(
            kernel[:, :, start:start + ln])

    evenconv = _conv(canvas[:, :, :, 1:-s].astype(weight.dtype), weight,
                     (2, 2), groups)
    oddconv = _conv(canvas[:, :, s:, s + 1:].astype(weight.dtype), weight,
                    (2, 2), groups)
    return _merge_phases(evenconv, oddconv, bias)


@functools.lru_cache(maxsize=None)
def _transpose_phase_plan(radius: int, stride: int, offset: int):
    """Numerically derive the zero-stuffing-free phase decomposition of
    :func:`hex_conv_transpose2d`.

    The canvas conv is linear with a periodic sparsity pattern: canvas
    occupancy repeats every ``2*stride`` rows/columns, and each conv
    phase advances 2 canvas cells per output step, so output positions
    fall into ``stride x stride`` classes per conv phase.  Within a
    class, the set of kernel taps that hit data — and the input pixel
    each tap reads, relative to an affine-in-(y, z) anchor — is
    translation invariant.  This function simulates the EXACT canvas
    index arithmetic of the canvas path on an integer "owner" array and
    extracts, per class: the anchor affine maps and the sub-kernel tap
    placements.

    Returns ``plans[conv_phase][(ya, za)] =
    (ai, bi, aj, bj, extent_i, extent_j, taps)`` with ``taps`` a tuple of
    ``(di, dj, hex_tap_index)``; input row read by a tap is
    ``ai*yq + bi + di`` for class step ``yq`` (columns analogous).
    """
    s, r = stride, radius
    ks = 2 * r - 1
    k_h, k_w = ks, 4 * r - 3
    p = r - 1
    # canonical size: large enough for >= 2 interior samples per class
    h0 = 8 * s + 4 * r
    w0 = 8 * s + 4 * r
    w1 = 2 * s * w0 - s + 2 + (1 - s % 2)
    h1 = s * h0 - s + 1
    own = -np.ones((h1, w1), np.int64)
    ev = np.arange(0, h0, 2)
    od = np.arange(1, h0, 2)
    for delta in (0, 1):
        col0 = offset * s + delta
        rr = 2 * s * np.arange(len(ev))
        cc = col0 + 2 * s * np.arange(w0)
        own[np.ix_(rr, cc)] = ev[:, None] * w0 + np.arange(w0)[None]
        col1 = (1 - offset) * s + delta
        if len(od):
            rr = s + 2 * s * np.arange(len(od))
            cc = col1 + 2 * s * np.arange(w0)
            own[np.ix_(rr, cc)] = od[:, None] * w0 + np.arange(w0)[None]
    own = np.pad(own, ((p, p), (2 * p, 2 * p)), constant_values=-1)
    wmap = -np.ones((k_h, k_w), np.int64)
    for (i, t, ln, start) in _hex_kernel_rows(r):
        wmap[i, t:t + (ln - 1) * 2 + 1:2] = np.arange(start, start + ln)
    views = (own[:, 1:own.shape[1] - s], own[s:, s + 1:])

    def fit_affine(pairs):
        """Exact integer least... exact affine fit y -> v; assert."""
        (q0, v0), (q1, v1) = pairs[0], pairs[-1]
        assert q1 != q0
        a, rem = divmod(v1 - v0, q1 - q0)
        assert rem == 0
        b = v0 - a * q0
        assert all(v == a * q + b for q, v in pairs)
        return a, b

    plans = []
    for view in views:
        H = (view.shape[0] - k_h) // 2 + 1
        W = (view.shape[1] - k_w) // 2 + 1
        cls = {}
        for ya in range(s):
            for za in range(s):
                recs = []
                for yq, y in enumerate(range(ya, H, s)):
                    for zq, z in enumerate(range(za, W, s)):
                        win = view[2 * y:2 * y + k_h, 2 * z:2 * z + k_w]
                        tm = {}
                        for ki in range(k_h):
                            for kj in range(k_w):
                                if wmap[ki, kj] < 0:
                                    continue
                                o = win[ki, kj]
                                if o >= 0:
                                    tm[(ki, kj)] = (o // w0, o % w0)
                        recs.append((yq, zq, tm))
                keysets = [frozenset(t) for (_, _, t) in recs]
                full = max(keysets, key=len, default=frozenset())
                if not full:
                    cls[(ya, za)] = None
                    continue
                interior = [rec for rec, k_ in zip(recs, keysets)
                            if k_ == full]
                ai = aj = None
                tap_affine = {}
                for tap in sorted(full):
                    ipairs = sorted({(yq, tm[tap][0])
                                     for (yq, _, tm) in interior})
                    jpairs = sorted({(zq, tm[tap][1])
                                     for (_, zq, tm) in interior})
                    # rows depend only on yq, cols only on zq
                    assert len({q for q, _ in ipairs}) == len(ipairs)
                    assert len({q for q, _ in jpairs}) == len(jpairs)
                    a_i, b_i = fit_affine(ipairs)
                    a_j, b_j = fit_affine(jpairs)
                    if ai is None:
                        ai, aj = a_i, a_j
                    assert (a_i, a_j) == (ai, aj)
                    tap_affine[tap] = (b_i, b_j)
                bi = min(v[0] for v in tap_affine.values())
                bj = min(v[1] for v in tap_affine.values())
                taps = tuple(
                    (v[0] - bi, v[1] - bj, int(wmap[tap]))
                    for tap, v in sorted(tap_affine.items()))
                ext_i = 1 + max(t[0] for t in taps)
                ext_j = 1 + max(t[1] for t in taps)
                cls[(ya, za)] = (ai, bi, aj, bj, ext_i, ext_j, taps)
        plans.append(cls)
    return tuple(plans)


def _hex_conv_transpose2d_phase(x, kernel, bias, *, even_odd_offset: int,
                                radius: int, stride: int, groups: int):
    """Phase-decomposed transposed conv: per output-phase class, one
    dense stride-``(ai, aj)`` conv DIRECTLY on the input with the
    sub-kernel of taps that hit data (see :func:`_transpose_phase_plan`);
    classes interleave into the two conv phases, which merge as usual."""
    kernel = jnp.asarray(kernel)
    b_, c, h, w = x.shape
    s, r = stride, radius
    ks = 2 * r - 1
    k_h, k_w = ks, 4 * r - 3
    p = r - 1
    o = kernel.shape[0]
    h1p = s * h - s + 1 + 2 * p
    w1p = 2 * s * w - s + 2 + (1 - s % 2) + 4 * p
    wv = w1p - 1 - s
    sizes = (((h1p - k_h) // 2 + 1, (wv - k_w) // 2 + 1),
             ((h1p - s - k_h) // 2 + 1, (wv - k_w) // 2 + 1))
    plans = _transpose_phase_plan(radius, stride, even_odd_offset)
    dt = kernel.dtype
    outs = []
    for cp, (H, W) in enumerate(sizes):
        Hm, Wm = -(-H // s), -(-W // s)
        subs = []
        for ya in range(s):
            for za in range(s):
                info = plans[cp].get((ya, za))
                Hq = len(range(ya, H, s))
                Wq = len(range(za, W, s))
                if info is None or Hq == 0 or Wq == 0:
                    subs.append(jnp.zeros((b_, o, Hm, Wm), dt))
                    continue
                ai, bi, aj, bj, ext_i, ext_j, taps = info
                subk = jnp.zeros((o, c // groups, ext_i, ext_j), dt)
                for di, dj, tap in taps:
                    subk = subk.at[:, :, di, dj].add(
                        kernel[:, :, tap].astype(dt))
                r0 = ai * 0 + bi
                r1 = ai * (Hq - 1) + bi + ext_i
                c0 = aj * 0 + bj
                c1 = aj * (Wq - 1) + bj + ext_j
                pt, pb = max(0, -r0), max(0, r1 - h)
                pl_, pr = max(0, -c0), max(0, c1 - w)
                xp = x
                if pt or pb or pl_ or pr:
                    xp = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (pl_, pr)))
                xs = xp[:, :, r0 + pt:r1 + pt, c0 + pl_:c1 + pl_]
                sub = _conv(xs.astype(dt), subk, (ai, aj), groups)
                if sub.shape[2] < Hm or sub.shape[3] < Wm:
                    sub = jnp.pad(sub, ((0, 0), (0, 0),
                                        (0, Hm - sub.shape[2]),
                                        (0, Wm - sub.shape[3])))
                subs.append(sub)
        arr = jnp.stack(subs).reshape(s, s, b_, o, Hm, Wm)
        arr = arr.transpose(2, 3, 4, 0, 5, 1).reshape(b_, o, Hm * s, Wm * s)
        outs.append(arr[:, :, :H, :W])
    return _merge_phases(outs[0], outs[1], bias)


def _merge_phases_nhwc(ev, od, bias):
    """:func:`functional._merge_phases` on channels-last arrays, as a
    stack+reshape interleave (a contiguous concat copy) instead of strided
    ``.at[::2].set`` writes — strided TPU stores lower to masked selects
    and measured ~2x the traffic cost (PERF.md round 3)."""
    pad_width = ev.shape[2] - od.shape[2]
    if pad_width > 0:
        ev = ev[:, :, :-pad_width]
    elif pad_width < 0:
        od = od[:, :, :pad_width]
    he, ho = ev.shape[1], od.shape[1]
    n = max(he, ho)
    if he < n:
        ev = jnp.pad(ev, ((0, 0), (0, n - he), (0, 0), (0, 0)))
    if ho < n:
        od = jnp.pad(od, ((0, 0), (0, n - ho), (0, 0), (0, 0)))
    out = jnp.stack([ev, od], axis=2).reshape(
        ev.shape[0], 2 * n, ev.shape[2], ev.shape[3])[:, :he + ho]
    if bias is not None:
        out = out + bias
    return out


def _hex_conv_transpose2d_matmul(xl, kernel, bias, *, even_odd_offset: int,
                                 radius: int, stride: int, groups: int):
    """Phase-decomposed transposed conv as one tap matmul + reshape
    interleaves (channels-last).

    Same plan as :func:`_hex_conv_transpose2d_phase`, restructured for the
    TPU memory system.  The conv-per-class executor (and a per-class
    matmul variant) both measured ~3-5 ms on the HexUNet decoder sizes —
    relayout-bound, not FLOP-bound (PERF.md round 3).  This executor:

    1. contracts the input against ALL distinct surviving taps in ONE
       f32-accumulated MXU matmul ``(B,H,W,C) @ (C, T*O)`` (input-sized,
       the cheap side of an upsampling op; T=3 for the radius-2/stride-2
       decoder case),
    2. assembles every class as shifted *strided reads* of that tap
       product summed on the VPU, and
    3. interleaves classes and conv phases purely with stack+reshape
       (contiguous concat copies) — no transposes, no strided writes.

    ``xl``: (B, H, W, C); returns (B, H', W', O).
    """
    kernel = jnp.asarray(kernel)
    b_, h, w, c = xl.shape
    s, r = stride, radius
    ks = 2 * r - 1
    k_h, k_w = ks, 4 * r - 3
    p = r - 1
    o = kernel.shape[0]
    cg, og = c // groups, o // groups
    h1p = s * h - s + 1 + 2 * p
    w1p = 2 * s * w - s + 2 + (1 - s % 2) + 4 * p
    wv = w1p - 1 - s
    sizes = (((h1p - k_h) // 2 + 1, (wv - k_w) // 2 + 1),
             ((h1p - s - k_h) // 2 + 1, (wv - k_w) // 2 + 1))
    plans = _transpose_phase_plan(radius, stride, even_odd_offset)
    dt = kernel.dtype

    used = sorted({t for cls in plans for info in cls.values()
                   if info is not None for _, _, t in info[6]})
    tap_pos = {t: n for n, t in enumerate(used)}
    nt = len(used)
    if groups == 1:
        wcat = jnp.concatenate([kernel[:, :, t].T for t in used], axis=1)
        y = _mm_lane(xl.astype(dt), wcat.astype(dt))
    else:
        gs = []
        for g in range(groups):
            wg = jnp.concatenate(
                [kernel[g * og:(g + 1) * og, :, t].T for t in used], axis=1)
            gs.append(_mm_lane(xl[..., g * cg:(g + 1) * cg].astype(dt),
                               wg.astype(dt)).reshape(b_, h, w, nt, og))
        y = jnp.concatenate(gs, -1)
    y = y.reshape(b_, h, w, nt, o)

    # one pad of the (input-sized) tap product covers every class's
    # shifted slice range
    pt = pb = pl_ = pr = 0
    for cp, (H, W) in enumerate(sizes):
        for ya in range(s):
            for za in range(s):
                info = plans[cp].get((ya, za))
                Hq = len(range(ya, H, s))
                Wq = len(range(za, W, s))
                if info is None or Hq == 0 or Wq == 0:
                    continue
                ai, bi, aj, bj, ext_i, ext_j, _ = info
                pt = max(pt, -bi)
                pb = max(pb, ai * (Hq - 1) + bi + ext_i - h)
                pl_ = max(pl_, -bj)
                pr = max(pr, aj * (Wq - 1) + bj + ext_j - w)
    if pt or pb or pl_ or pr:
        y = jnp.pad(y, ((0, 0), (pt, pb), (pl_, pr), (0, 0), (0, 0)))

    outs = []
    for cp, (H, W) in enumerate(sizes):
        Hm, Wm = -(-H // s), -(-W // s)
        rows_cls = []
        for ya in range(s):
            cols_cls = []
            for za in range(s):
                info = plans[cp].get((ya, za))
                Hq = len(range(ya, H, s))
                Wq = len(range(za, W, s))
                if info is None or Hq == 0 or Wq == 0:
                    cols_cls.append(jnp.zeros((b_, Hm, Wm, o), dt))
                    continue
                ai, bi, aj, bj, ext_i, ext_j, taps = info
                acc = None
                for di, dj, tap in taps:
                    rr = slice(bi + di + pt, bi + di + pt
                               + ai * (Hq - 1) + 1, ai)
                    cc = slice(bj + dj + pl_, bj + dj + pl_
                               + aj * (Wq - 1) + 1, aj)
                    v = y[:, rr, cc, tap_pos[tap], :]
                    acc = v if acc is None else acc + v
                if acc.shape[1] < Hm or acc.shape[2] < Wm:
                    acc = jnp.pad(acc, ((0, 0), (0, Hm - acc.shape[1]),
                                        (0, Wm - acc.shape[2]), (0, 0)))
                cols_cls.append(acc)
            row = (cols_cls[0] if s == 1 else
                   jnp.stack(cols_cls, axis=3).reshape(b_, Hm, Wm * s, o))
            rows_cls.append(row)
        arr = (rows_cls[0] if s == 1 else
               jnp.stack(rows_cls, axis=2).reshape(b_, Hm * s, Wm * s, o))
        outs.append(arr[:, :H, :W, :])
    return _merge_phases_nhwc(outs[0], outs[1], bias)


def hex_pixel_shuffle(x, upscale_factor: int):
    """Sub-pixel hex upsampling (archive codes:68-126): C*u^2 channels ->
    C channels at u-times the hex resolution, channels scattered onto the
    hex-kernel footprint of each cell."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    u = upscale_factor
    b, cin, h, w = x.shape
    if cin % (u * u):
        raise ValueError("channels must be divisible by upscale_factor^2")
    cout = cin // (u * u)
    odd_h = h // 2
    even_h = h - odd_h
    out_h = u * h + u - 1
    out_w = u * w + u // 2
    out = jnp.zeros((b, cout, out_h, out_w * 2 + 1), x.dtype)
    type1_off = 1 if u % 2 == 0 else -1

    n = 0
    for i in range(2 * u - 1):
        t = abs(1 + i - u)
        for k in range(u - t):
            chunk = x[:, n * cout:(n + 1) * cout]
            ev = chunk[:, :, ::2, :]
            od = chunk[:, :, 1::2, :]
            for base in (1 + t + 2 * k, 1 + t + 2 * k + type1_off):
                out = out.at[:, :,
                             i:i + 2 * u * (even_h - 1) + 1:2 * u,
                             base:base + (w - 1) * 2 * u + 1:2 * u].set(ev)
            for base in (u + 1 + t + 2 * k, u + 1 + t + 2 * k + type1_off):
                if od.shape[2] > 0:
                    out = out.at[:, :,
                                 u + i:u + i + 2 * u * (odd_h - 1) + 1:2 * u,
                                 base:base + (w - 1) * 2 * u + 1:2 * u].set(od)
            n += 1
    if u < 2:
        raise ValueError("upscale_factor must be >= 2 (the archive's crop "
                         "degenerates to an empty tensor for u=1)")
    hex_out, _ = type1_to_heximage(out, 0)
    # archive crop: [u-1 : -u+1, u//2 : -u//2] where the last bound parses
    # as (-u)//2 (unary minus binds first) — 1 wider crop for odd u
    return hex_out[:, :, u - 1:-u + 1, u // 2:(-u) // 2]


# ------------------------------- poolings ----------------------------------

def pixel_even_row_quadtree_unfold(x):
    """(codes:637-644): 4 quadtree leaves per cell -> (..., 4)."""
    l0 = x[:, :, 1:-1:4, 0:-1:2]
    l1 = x[:, :, 2::4, 0:-1:2]
    l2 = x[:, :, 1:-1:4, 1::2]
    l3 = x[:, :, 0:-2:4, 1::2]
    hh = min(a.shape[2] for a in (l0, l1, l2, l3))
    ww = min(a.shape[3] for a in (l0, l1, l2, l3))
    return jnp.stack([a[:, :, :hh, :ww] for a in (l0, l1, l2, l3)], axis=4)


def quadtree_hex_pooling(x, method: str, offset: int = 0):
    """Quadtree pooling (archive codes:494-532): pool the 4 child cells of
    a coarser hex hierarchy level."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    reduce_fn = _reduction(method)
    even = pixel_even_row_quadtree_unfold(x[:, :, offset:, :-1])
    odd = pixel_even_row_quadtree_unfold(x[:, :, offset + 2:, 1:])
    pad_w = even.shape[3] - odd.shape[3]
    if pad_w > 0:
        even = even[:, :, :, :-pad_w]
    elif pad_w < 0:
        odd = odd[:, :, :, :pad_w]
    hh = even.shape[2] + odd.shape[2]
    pooled = jnp.zeros((even.shape[0], even.shape[1], hh, even.shape[3], 4),
                       x.dtype)
    pooled = pooled.at[:, :, ::2].set(even[:, :, :(hh + 1) // 2])
    pooled = pooled.at[:, :, 1::2].set(odd[:, :, :hh // 2])
    return reduce_fn(pooled)


def pixel_even_row_dimond_unfold_1(x, d: int, stride: Optional[int] = None,
                                   offset: int = 0):
    """Diamond-footprint unfold over a type-1 image (codes:645-675)."""
    if stride is None:
        stride = d
    height = int(np.ceil((x.shape[2] + 1 - 2 * d + 1) / (2 * stride)))
    width = int(np.ceil(int((x.shape[3] - 1) / 2 + 1 - d) / stride))
    pieces = []
    for i in range(2 * d - 1):
        t = abs(1 + i - d)
        for k in range(d - t):
            pieces.append(x[:, :,
                            i:i + 2 * stride * (height - 1) + 1:2 * stride,
                            1 + t + 2 * k:(1 + t + 2 * k) + (width - 1) * 2 * stride + 1:2 * stride])
    return jnp.stack(pieces, axis=4)


def diamond_hex_pooling(x, method: str, kernelsize: int = 2,
                        stride: Optional[int] = None, padding: int = 0,
                        even_odd_offset: int = 0,
                        padding_mode: str = "constant", padding_value=0):
    """Diamond pooling (archive ``Dimond_HexPooling``, codes:533-585)."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    reduce_fn = _reduction(method)
    if stride is None:
        stride = kernelsize
    off = (even_odd_offset + padding) % 2
    x = pad2d(x, padding, padding_mode, padding_value)
    t1 = heximage_to_type1(x, off)
    even = pixel_even_row_dimond_unfold_1(t1, kernelsize, stride, off)
    odd = pixel_even_row_dimond_unfold_1(t1[:, :, stride:, stride:],
                                         kernelsize, stride, off)
    pad_w = even.shape[3] - odd.shape[3]
    if pad_w > 0:
        even = even[:, :, :, :-pad_w]
    elif pad_w < 0:
        odd = odd[:, :, :, :pad_w]
    hh = even.shape[2] + odd.shape[2]
    pooled = jnp.zeros((even.shape[0], even.shape[1], hh, even.shape[3],
                        kernelsize ** 2), x.dtype)
    pooled = pooled.at[:, :, ::2].set(even[:, :, :(hh + 1) // 2])
    pooled = pooled.at[:, :, 1::2].set(odd[:, :, :hh // 2])
    return reduce_fn(pooled)


def pixel_even_row_square_unfold(x, d: int, stride: Optional[int] = None):
    """(codes:712-739): fxf windows of even rows -> (..., f^2)."""
    if stride is None:
        stride = d
    if d % 2 or stride % 2:
        raise ValueError("factor d and stride must be even")
    height = int(np.ceil((x.shape[2] - d + 1) / (2 * stride)))
    width = int(np.ceil(x.shape[3] - d + 1) / stride)
    width = int(width)
    pieces = []
    for i in range(d):
        for j in range(d):
            pieces.append(x[:, :,
                            i:i + 2 * stride * (height - 1) + 1:2 * stride,
                            j:j + stride * (width - 1) + 1:stride])
    return jnp.stack(pieces, axis=4)


def hex_to_square_original_resolution(x, kernel=None, *,
                                      even_odd_offset: int = 0,
                                      padding: int = 0,
                                      padding_mode: str = "constant",
                                      padding_value=0):
    """Same-resolution hex->rect transform via 2x2 diamond blending
    (archive codes:587-636); odd rows are re-blended from their diamond
    neighbourhood, even rows pass through."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    c = x.shape[1]
    if kernel is None:
        kernel = diamond_weight(c, 2)
    kernel = jnp.asarray(kernel)
    off = (even_odd_offset + padding) % 2
    x = pad2d(x, padding, padding_mode, padding_value)
    result = x
    t1 = heximage_to_type1(x, off)
    even = pixel_even_row_dimond_unfold_1(t1, 2, 1, 0)
    tmp = jnp.einsum("bchwk,ck->bchw", even.astype(kernel.dtype), kernel)
    result = result.astype(tmp.dtype).at[:, :, 1:-1:2, 1:].set(tmp)
    return result[:, :, :, 1:]


# --------------------------- im2col reference ------------------------------

def hex_im2col(x, even_odd_offset: int, kernel_radius: int,
               stride: int = 1, padding: int = 0):
    """Hex neighbourhood unfold (archive codes:366-419, vectorised).

    Returns (B, out_h*out_w, kernelnum*C) matching the archive's loop
    semantics (including the parity-dependent kernel shape,
    ``dl = |h + offset + r - 1 - padding| & 1``).
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    x = pad2d(x, padding)
    b, c, h, w = x.shape
    r = kernel_radius
    ks = 2 * r - 1
    out_h = (h - ks) // stride + 1
    out_w = (w - ks) // stride + 1
    patches = []
    for h0 in range(0, h - ks + 1, stride):
        dl = abs(h0 + even_odd_offset + r - 1 - padding) & 1
        row_vecs = []
        for l in range(ks):
            t = abs(l + 1 - r)
            ln = ks - t
            c0 = t // 2 + dl * (t & 1)
            for w0 in range(ln):
                row_vecs.append(x[:, :, h0 + l,
                                  c0 + w0:c0 + w0 + (out_w - 1) * stride + 1:stride])
        # archive flatten order is channel-major: (C, kernelnum).flatten()
        # (codes:406-411) -> lay out as (B, out_w, C*kn)
        stackd = jnp.stack(row_vecs, axis=1)       # (B, kn, C, out_w)
        patches.append(jnp.transpose(stackd, (0, 3, 2, 1)).reshape(
            b, out_w, -1))
    return jnp.concatenate(patches, axis=1)        # (B, out_h*out_w, C*kn)


def im2col_hex_conv2d(x, weight, bias=None, *, even_odd_offset: int = 0,
                      kernel_radius: int, stride: int = 1, padding: int = 0):
    """im2col-based hex conv (archive codes:277-364): unfold then one
    matmul.  ``weight``: (kernelnum*C, O) as in the archive."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    b, c, h, w = x.shape
    ks = 2 * kernel_radius - 1
    out_w = (w - ks + 2 * padding) // stride + 1
    out_h = (h - ks + 2 * padding) // stride + 1
    cols = hex_im2col(x, even_odd_offset, kernel_radius, stride, padding)
    out = cols.astype(weight.dtype) @ weight
    if bias is not None:
        out = out + bias
    out = jnp.transpose(out, (0, 2, 1))
    return out.reshape(b, -1, out_h, out_w)
