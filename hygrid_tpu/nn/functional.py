"""Functional hex NN ops (layer L3 core).

Rebuild of ``HexFrames.py`` on jax.  Two interchangeable convolution
implementations:

* ``impl="type1"`` — mirrors the reference algorithm exactly
  (``HexFrames.py:96-169``): scatter the ``3r^2-3r+1`` hex weights into a
  sparse rect kernel, expand the input to the double-width type-1 packing,
  run two strided convs (even/odd row phases), trim and interleave.

* ``impl="direct"`` (default) — TPU-native reformulation.  The type-1
  expansion is algebraically eliminated: because type-1 merely duplicates
  each hex pixel at columns ``2j+q`` / ``2j+1+q``, each tap of the sparse
  kernel reads hex pixel ``j = s*wo + d*k + c0(i)`` of the ORIGINAL storage,
  where the per-kernel-row column offset ``c0`` folds the brick-wall parity.
  The result is two dense masked convs with window stride ``(2s, s)`` on the
  un-expanded image — ~2x fewer FLOPs, half the memory traffic, and XLA maps
  them straight onto the MXU.  Both paths agree to float tolerance (tested).

All shape bookkeeping happens in Python at trace time; everything under jit
is static-shaped.
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "pad2d",
    "hex_kernel_num",
    "scatter_hex_kernel",
    "hex_conv2d",
    "hex_conv2d_output_shape",
    "hex_pool2d",
    "hex_adaptive_pool2d",
    "hex_global_pool2d",
    "max_pooling",
    "min_pooling",
    "average_pooling",
]

_DN = ("NCHW", "OIHW", "NCHW")

_PAD_MODES = {
    "constant": "constant",
    "zeros": "constant",
    "reflect": "reflect",
    "replicate": "edge",
    "circular": "wrap",
}


def pad2d(x, padding, mode: str = "constant", value=0):
    """Symmetric spatial padding of (..., H, W); the ``pad`` helper of
    ``HexFrames.py:13-21``.  ``padding`` may be an int or
    ``(left, right, top, bottom)`` (torch ``F.pad`` order)."""
    if isinstance(padding, int):
        l = r = t = b = padding
    else:
        l, r, t, b = padding
    if l == r == t == b == 0:
        return x
    pw = [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)]
    jmode = _PAD_MODES[mode]
    if jmode == "constant":
        return jnp.pad(x, pw, mode="constant", constant_values=value)
    return jnp.pad(x, pw, mode=jmode)


def hex_kernel_num(radius: int) -> int:
    """Number of cells in a hex kernel of the given radius
    (``HexFrames.py:52``)."""
    return 3 * radius * radius - 3 * radius + 1


def _hex_kernel_rows(radius: int):
    """Per-row layout of the flat hex kernel: (row, vdist, ncells, start)."""
    ks = 2 * radius - 1
    rows, start = [], 0
    for i in range(ks):
        t = abs(i - radius + 1)
        ln = ks - t
        rows.append((i, t, ln, start))
        start += ln
    return rows


def scatter_hex_kernel(kernel, radius: int, dilation: int = 1):
    """Scatter flat hex weights (O, I, kernelnum) into the sparse rect kernel
    (O, I, k_h, k_w) used over type-1 images (``HexFrames.py:108-118``)."""
    d = dilation
    ks = 2 * radius - 1
    k_h = (ks - 1) * d + 1
    k_w = 2 * d * (ks - 1) + 1
    out = jnp.zeros(kernel.shape[:2] + (k_h, k_w), kernel.dtype)
    for (i, t, ln, start) in _hex_kernel_rows(radius):
        out = out.at[:, :, i * d, t * d: t * d + (ln - 1) * 2 * d + 1: 2 * d].set(
            kernel[:, :, start:start + ln])
    return out


def _type1_expand(x, parity: int):
    """heximage -> type-1 on (B, C, H, W); see ops.convert (duplicated here
    to keep nn free of cross-package import cycles)."""
    b, c, h, w = x.shape
    doubled = jnp.repeat(x, 2, axis=3)
    padded = jnp.pad(doubled, ((0, 0), (0, 0), (0, 0), (1, 1)))
    q = (jnp.arange(h) + parity) % 2
    col = jnp.arange(2 * w + 1)[None, :] + (q[:, None] ^ 1)
    return jnp.take_along_axis(padded, col[None, None], axis=3)


def _conv(x, w, stride, groups):
    # Low-precision convs run WITHOUT preferred_element_type: XLA
    # accumulates bf16 convs in f32 on the MXU regardless (verified
    # bit-equal against pet=f32 + round on CPU and TPU), and jax's conv
    # *transpose* rule rejects pet != operand dtype ("requires arguments
    # to have the same dtypes": the f32 cotangent meets the bf16 weights),
    # which broke every mixed-precision training step reaching this path.
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=_DN, feature_group_count=groups)


def _f32acc_matmul(spec_fwd: str, spec_dx: str, spec_dm: str):
    """An einsum with f32 accumulation (``preferred_element_type``) that
    stays differentiable in mixed precision.

    jax's dot/conv *transpose* rules feed the f32 cotangent of a
    pet=f32 einsum back as a bf16 x bf16 -> f32 dot, which XLA:CPU's
    DotThunk cannot execute (TPU can) — so a jitted ``grad`` of any bf16
    model through these paths crashed on CPU.  The custom VJP keeps the
    f32-accumulated forward bit-for-bit and computes the data grad as a
    full-rate low-precision dot (standard mixed-precision practice) and
    the weight grad with f32 accumulation (weight grads sum over the
    whole batch*spatial extent, where bf16 accumulation loses bits).
    For f32 inputs both grads equal jax's own."""

    @jax.custom_vjp
    def f(xx, mm):
        pet = (jnp.float32 if xx.dtype in (jnp.bfloat16, jnp.float16)
               else xx.dtype)
        return jnp.einsum(spec_fwd, xx, mm, preferred_element_type=pet)

    def fwd(xx, mm):
        return f(xx, mm), (xx, mm)

    def bwd(res, g):
        xx, mm = res
        gc = g.astype(xx.dtype)
        dx = jnp.einsum(spec_dx, gc, mm)
        pet = (jnp.float32 if xx.dtype in (jnp.bfloat16, jnp.float16)
               else xx.dtype)
        dm = jnp.einsum(spec_dm, xx, gc, preferred_element_type=pet)
        return dx.astype(xx.dtype), dm.astype(mm.dtype)

    f.defvjp(fwd, bwd)
    return f


# one lane-contraction layout serves both the mxu and the packed path:
# (B, H, W, K) @ (K, N) — channels/taps trailing, the layout XLA:CPU's
# DotThunk supports for mixed-precision outputs and XLA:TPU contracts
# along lanes without a hidden relayout
_mm_lane = _f32acc_matmul(
    "bhwk,kn->bhwn", "bhwn,kn->bhwk", "bhwk,bhwn->kn")


def hex_conv2d_output_shape(h: int, w: int, radius: int, stride: int = 1,
                            padding: int = 0, dilation: int = 1
                            ) -> Tuple[int, int]:
    """Output (H', W') of hex_conv2d for an (h, w) input, following the
    reference's exact bookkeeping over the type-1 image."""
    h, w = h + 2 * padding, w + 2 * padding
    s, d = stride, dilation
    ks = 2 * radius - 1
    k_h = (ks - 1) * d + 1
    k_w = 2 * d * (ks - 1) + 1
    wt = 2 * w + 1
    wo = (wt - 1 - s - k_w) // (2 * s) + 1 if wt - 1 - s >= k_w else 0
    ho_e = (h - k_h) // (2 * s) + 1 if h >= k_h else 0
    ho_o = (h - s - k_h) // (2 * s) + 1 if h - s >= k_h else 0
    return ho_e + ho_o, wo


def _hex_conv2d_type1(x, weight, bias, parity, s, groups, k_h, k_w):
    """Reference-mirroring path (HexFrames.py:124-169)."""
    t1 = _type1_expand(x, parity)
    even_in = t1[:, :, :, 1:-s]
    odd_in = t1[:, :, s:, s + 1:]
    evenconv = oddconv = None
    if even_in.shape[2] >= k_h and even_in.shape[3] >= k_w:
        evenconv = _conv(even_in, weight, (2 * s, 2 * s), groups)
    if odd_in.shape[2] >= k_h and odd_in.shape[3] >= k_w:
        oddconv = _conv(odd_in, weight, (2 * s, 2 * s), groups)
    return _merge_phases(evenconv, oddconv, bias)


def _merge_phases(evenconv, oddconv, bias):
    if evenconv is not None and oddconv is not None:
        pad_width = evenconv.shape[3] - oddconv.shape[3]
        if pad_width > 0:
            evenconv = evenconv[:, :, :, :-pad_width]
        elif pad_width < 0:
            oddconv = oddconv[:, :, :, :pad_width]
        b, c = evenconv.shape[:2]
        he, ho, wo = evenconv.shape[2], oddconv.shape[2], evenconv.shape[3]
        out = jnp.zeros((b, c, he + ho, wo), evenconv.dtype)
        out = out.at[:, :, ::2].set(evenconv[:, :, :(he + ho + 1) // 2])
        out = out.at[:, :, 1::2].set(oddconv[:, :, :(he + ho) // 2])
    elif evenconv is not None:
        out = evenconv
    elif oddconv is not None:
        out = oddconv
    else:
        raise ValueError(
            "input too small for this hex kernel "
            "(the reference crashes here too, HexFrames.py:163)")
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def _direct_phase_kernel(kernel, radius, d, c0):
    """Dense masked kernel for one row-parity phase of the direct path.
    Taps of kernel row i land at columns ``c0[i] - base + d*k``."""
    rows = _hex_kernel_rows(radius)
    base = min(c0)
    k_h = (2 * radius - 2) * d + 1
    k_w = max(c0[i] - base + d * (ln - 1) for (i, t, ln, st) in rows) + 1
    out = jnp.zeros(kernel.shape[:2] + (k_h, k_w), kernel.dtype)
    for (i, t, ln, start) in rows:
        c = c0[i] - base
        out = out.at[:, :, i * d, c: c + (ln - 1) * d + 1: d].set(
            kernel[:, :, start:start + ln])
    return out, base, k_w


def _hex_conv2d_direct(x, kernel, bias, parity, radius, s, d, groups):
    """TPU-native path: two masked convs on the ORIGINAL brick-wall storage.

    Derivation: a tap of the type-1 kernel at (row i*d, col t*d + 2dk) read
    through the even-phase slice ``T[:, :, :, 1:-s]`` with stride (2s, 2s)
    touches hex pixel ``(2s*ho + i*d, s*wo + d*k + c0_e(i))`` with
    ``c0_e(i) = (1 + t*d - (i*d+p)%2) // 2``; the odd phase analogously with
    ``c0_o(i) = (s + 1 + t*d - (s+i*d+p)%2) // 2``.  Window stride over the
    un-expanded image is therefore (2s, s).
    """
    b, c, h, w = x.shape
    rows = _hex_kernel_rows(radius)
    ks = 2 * radius - 1
    k_h = (ks - 1) * d + 1
    k_w_t1 = 2 * d * (ks - 1) + 1
    wt = 2 * w + 1

    c0e = [(1 + t * d - ((i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]
    c0o = [(s + 1 + t * d - ((s + i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]

    exists_e = h >= k_h and wt - 1 - s >= k_w_t1
    exists_o = h - s >= k_h and wt - s - 1 >= k_w_t1
    wo = (wt - 1 - s - k_w_t1) // (2 * s) + 1

    evenconv = oddconv = None
    if exists_e or exists_o:
        ke, base_e, kwe = _direct_phase_kernel(kernel, radius, d, c0e)
        ko, base_o, kwo = _direct_phase_kernel(kernel, radius, d, c0o)
        need = max(base_e + kwe + s * (wo - 1), base_o + kwo + s * (wo - 1))
        if need > w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, need - w)))
        if exists_e:
            ho_e = (h - k_h) // (2 * s) + 1
            evenconv = _conv(x[:, :, :, base_e:], ke, (2 * s, s), groups)
            evenconv = evenconv[:, :, :ho_e, :wo]
        if exists_o:
            ho_o = (h - s - k_h) // (2 * s) + 1
            oddconv = _conv(x[:, :, s:, base_o:], ko, (2 * s, s), groups)
            oddconv = oddconv[:, :, :ho_o, :wo]
    return _merge_phases(evenconv, oddconv, bias)


def _hex_conv2d_mxu(x, kernel, bias, parity, radius, s, d, groups):
    """MXU path: hex conv as one tap-concatenated matmul per row phase.

    XLA's conv op runs at <1 TFLOP/s for small channel counts (the MXU
    contraction dim is only C); stacking all ``kernelnum`` taps along the
    contraction axis gives a (pixels, T*C) @ (T*C, O) matmul with a
    ~128-wide contraction — an order of magnitude faster at C<=32.
    Identical tap geometry to the direct path (same c0 offsets).
    """
    if groups != 1:
        return _hex_conv2d_direct(x, kernel, bias, parity, radius, s, d, groups)
    b, c, h, w = x.shape
    rows = _hex_kernel_rows(radius)
    ks = 2 * radius - 1
    k_h = (ks - 1) * d + 1
    k_w_t1 = 2 * d * (ks - 1) + 1
    wt = 2 * w + 1

    c0e = [(1 + t * d - ((i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]
    c0o = [(s + 1 + t * d - ((s + i * d + parity) % 2)) // 2
           for (i, t, ln, st) in rows]

    exists_e = h >= k_h and wt - 1 - s >= k_w_t1
    exists_o = h - s >= k_h and wt - s - 1 >= k_w_t1
    if not (exists_e and exists_o):
        return _hex_conv2d_direct(x, kernel, bias, parity, radius, s, d, groups)
    wo = (wt - 1 - s - k_w_t1) // (2 * s) + 1
    ho_e = (h - k_h) // (2 * s) + 1
    ho_o = (h - s - k_h) // (2 * s) + 1

    need = max(max(c0) + (ks - 1) * d + s * (wo - 1) + 1 for c0 in (c0e, c0o))
    if need > w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, need - w)))

    # weight: (O, C, T) -> (T*C, O), tap-major to match patch concat order
    o_ch = kernel.shape[0]
    w2 = jnp.transpose(kernel, (2, 1, 0)).reshape(-1, o_ch)

    xl = jnp.moveaxis(x, 1, -1)                        # (B, H, W, C)

    def phase(r0, c0, ho):
        taps = []
        for (i, t, ln, start) in rows:
            for k in range(ln):
                col = c0[i] + d * k
                taps.append(lax.slice(
                    xl,
                    (0, r0 + i * d, col, 0),
                    (b, r0 + i * d + 2 * s * (ho - 1) + 1,
                     col + s * (wo - 1) + 1, c),
                    (1, 2 * s, s, 1)))
        patches = jnp.concatenate(taps, axis=-1)       # (B, Ho, Wo, T*C)
        out = _mm_lane(patches, w2).astype(x.dtype)
        return jnp.moveaxis(out, -1, 1)                # (B, O, Ho, Wo)

    evenconv = phase(0, c0e, ho_e)
    oddconv = phase(s, c0o, ho_o)
    return _merge_phases(evenconv, oddconv, bias)


def _hex_conv2d_packed(x, kernel, bias, parity, radius, s, d, groups):
    """Pixel-packed Kronecker-matmul path (stride 1, groups 1).

    TPU lanes are 128-wide; with C channels, Q = 128 // C consecutive
    output pixels are packed into one lane vector of Q*C values.  A tap at
    column shift c maps packed column ``wp`` to source packed columns
    ``wp + c//Q`` and ``wp + c//Q + 1`` with an intra-pack rotation, so each
    kernel row collapses into a few dense (Q*C, Q*Cout) matrices
    ("shift-matrix (x) tap-weight" Kronecker blocks, summed over the row's
    taps).  The whole hex conv becomes ~(2r-1)*2 matmuls with a FULL
    128-lane contraction — an order of magnitude faster than XLA's conv op
    at small C (which contracts only C lanes).

    Falls back to the direct path when the packing does not apply.
    """
    b, c, h, w = x.shape
    co = kernel.shape[0]
    q = 128 // c if c <= 64 and 128 % c == 0 else 1
    if s != 1 or groups != 1 or q <= 1 or co > 128:
        return _hex_conv2d_direct(x, kernel, bias, parity, radius, s, d, groups)

    rows = _hex_kernel_rows(radius)
    ks = 2 * radius - 1
    k_h = (ks - 1) * d + 1
    k_w_t1 = 2 * d * (ks - 1) + 1
    wt = 2 * w + 1
    if not (h >= k_h and h - 1 >= k_h and wt - 2 >= k_w_t1):
        return _hex_conv2d_direct(x, kernel, bias, parity, radius, s, d, groups)

    c0e = [(1 + t * d - ((i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]
    c0o = [(2 + t * d - ((1 + i * d + parity) % 2)) // 2 for (i, t, ln, st) in rows]
    wo = (wt - 2 - k_w_t1) // 2 + 1
    ho_e = (h - k_h) // 2 + 1
    ho_o = (h - 1 - k_h) // 2 + 1

    # packed width covering every (output pixel + max shift)
    max_c = max(max(c0e), max(c0o)) + d * (ks - 1)
    wp_out = -(-wo // q)                       # packed output columns
    src_wp = wp_out + ((q - 1) + max_c) // q + 1
    if src_wp * q > w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, src_wp * q - w)))
    else:
        x = x[:, :, :, :src_wp * q]

    # NHWC, split rows by parity, pack Q pixels into lanes: (B, H2, WP, Q*C)
    xl = jnp.moveaxis(x, 1, -1)
    h2 = h // 2
    xe = xl[:, 0::2].reshape(b, (h + 1) // 2, src_wp, q * c)
    xo = xl[:, 1::2].reshape(b, h2, src_wp, q * c)
    # one lookahead row each (phase rows index ho + i//2 <= ho + r - 1)
    extra = (k_h + 1) // 2
    xe = jnp.pad(xe, ((0, 0), (0, extra), (0, 0), (0, 0)))
    xo = jnp.pad(xo, ((0, 0), (0, extra), (0, 0), (0, 0)))

    kern = kernel.astype(jnp.float32)

    def build_mats(c0):
        """Per (kernel row, packed-col shift) matrices M[(i, s)] of shape
        (Q*C, Q*Cout): M[qs*C+ci, qo*Cout+co] += W_tap[ci, co].
        Scatter positions are static; values come from the (possibly
        traced) kernel, so assembly uses jnp .at updates."""
        slots: dict = {}
        for (i, t, ln, start) in rows:
            for k in range(ln):
                cshift = c0[i] + d * k
                for qo in range(q):
                    src = qo + cshift
                    sblk, qs = src // q, src % q
                    slots.setdefault((i, sblk), []).append((qs, qo, start + k))
        mats = {}
        for key, entries in slots.items():
            m = jnp.zeros((q * c, q * co), jnp.float32)
            for qs, qo, tap in entries:
                m = m.at[qs * c:(qs + 1) * c, qo * co:(qo + 1) * co].add(
                    kern[:, :, tap].T)
            mats[key] = m
        return mats

    cdt = x.dtype

    def phase(c0, ho, row_of, src_of):
        mats = build_mats(c0)
        out = None
        for (i, sblk), m in sorted(mats.items()):
            src = xe if src_of(i) == 0 else xo
            r0 = row_of(i)
            blk = lax.slice(src, (0, r0, sblk, 0),
                            (b, r0 + ho, sblk + wp_out, q * c))
            term = _mm_lane(blk.astype(cdt), jnp.asarray(m, cdt))
            out = term if out is None else out + term
        # unpack (B, Ho, WP, Q*Cout) -> (B, Cout, Ho, Wo)
        out = out.reshape(b, ho, wp_out * q, co)[:, :, :wo]
        return jnp.moveaxis(out, -1, 1).astype(cdt)

    # even phase: input row 2*ho + i*d -> parity (i*d)%2, row ho + (i*d)//2
    evenconv = phase(c0e, ho_e,
                     row_of=lambda i: (i * d) // 2,
                     src_of=lambda i: (i * d) % 2)
    # odd phase: input row 2*ho + 1 + i*d
    oddconv = phase(c0o, ho_o,
                    row_of=lambda i: (1 + i * d) // 2,
                    src_of=lambda i: (1 + i * d) % 2)
    return _merge_phases(evenconv, oddconv, bias)


def hex_conv2d(x, kernel, bias=None, *, even_odd_offset: int = 0,
               radius: int, stride: int = 1, padding: int = 0,
               dilation: int = 1, groups: int = 1,
               padding_mode: str = "constant", padding_value=0,
               impl: str = "direct"):
    """Hexagonal convolution over brick-wall storage.

    Args:
        x: (B, C, H, W) (or fewer dims, auto-expanded like
           ``HexFrames.py:119-120``).
        kernel: flat hex weights (O, C // groups, kernelnum) with
           ``kernelnum = 3r^2 - 3r + 1``; rows ordered top-to-bottom,
           cells left-to-right (``HexFrames.py:74,114-118``).
        even_odd_offset: parity of the FIRST input row; flips with padding
           (``HexFrames.py:44``).
        impl: ``"direct"`` (TPU-native, default) or ``"type1"``
           (reference-mirroring).

    Returns (B, O, H', W') with output offset 0 (``HexFrames.py:56``).
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 4:  # accept reference (O, I, 1, kernelnum) layout
        kernel = kernel[:, :, 0, :]
    x = x.astype(kernel.dtype)
    x = pad2d(x, padding, padding_mode, padding_value)
    parity = (even_odd_offset + padding) % 2
    s, d = stride, dilation
    if impl == "auto":
        # single-op routing, measured on v5e (PERF.md impl sweep + the
        # round-5 9-cell large-conv sweep, conv_auto_big_ab.py /
        # bandcells_direct.py): at stride 1 the tap-concatenated matmul
        # ("mxu") wins for NARROW channels at MODERATE sizes (C <= 32,
        # < 2^26 elements — e.g. C=8 512^2 b16: 1.76 vs 3.56 direct ms);
        # XLA's native conv ("direct") wins once the contraction is wide
        # (C >= 64: 1.22 vs 3.13 mxu at 128^2 b32 — the round-3 "C <= 64"
        # cutoff contradicted its own sweep row) or the input is large
        # (mxu falls off a cliff between 2^25 and 2^26 elements: C=32
        # 256^2 b16 1.61 mxu-best vs b32 6.93 mxu / 4.15 direct) — and at
        # ANY stride > 1, where the mxu path's strided tap slices lower
        # to relayouts (PERF.md round 4: the HexViT stride-2 stem
        # measured mxu 9.28 / direct 0.30 ms — 30x).  Single-op pallas
        # never beats the best XLA impl by more than noise (its value is
        # the stack kernel).  Chains of 'same' convs should use
        # hex_conv_stack_pallas, which packs once and beats any per-op
        # path.
        c = x.shape[1]
        if groups == 1 and c <= 32 and s == 1 and x.size < 2 ** 26:
            impl = "mxu"
        else:
            impl = "direct"
    if impl == "type1":
        ks = 2 * radius - 1
        k_h = (ks - 1) * d + 1
        k_w = 2 * d * (ks - 1) + 1
        weight = scatter_hex_kernel(kernel, radius, d)
        return _hex_conv2d_type1(x, weight, bias, parity, s, groups, k_h, k_w)
    if impl == "direct":
        return _hex_conv2d_direct(x, kernel, bias, parity, radius, s, d, groups)
    if impl == "mxu":
        return _hex_conv2d_mxu(x, kernel, bias, parity, radius, s, d, groups)
    if impl == "packed":
        return _hex_conv2d_packed(x, kernel, bias, parity, radius, s, d, groups)
    if impl == "pallas":
        from ..kernels.conv_pallas import (packed_hex_conv_pallas,
                                           pallas_conv_applicable)
        if pallas_conv_applicable(x.shape[1], kernel.shape[0], s, groups,
                                  n_elements=x.size) \
                and x.shape[2] - 2 >= (2 * radius - 2) * d + 1:
            # padding already applied above; parity already folded
            return packed_hex_conv_pallas(
                x, kernel, bias, even_odd_offset=parity, radius=radius,
                padding=0, dilation=d)
        return _hex_conv2d_packed(x, kernel, bias, parity, radius, s, d, groups)
    raise ValueError(f"unknown impl {impl!r}")


def hex_conv2d_adaptive_padding(x, kernel, bias=None, *, even_odd_offset: int = 0,
                                radius: int, stride: int = 1, dilation: int = 1,
                                groups: int = 1, impl: str = "direct"):
    """TF-"same"-style hex conv (``HexFrames.py:232-253``).

    Pads asymmetrically so ``output_h = ceil(h / stride)`` (note the
    reference's width rule uses ``output_w`` not ``output_w - 1`` — kept).
    Like the reference, the row-parity handed to the conv ignores the rows
    added on top (``padded_even_odd_offset`` is computed before this pad).
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    h, w = x.shape[-2:]
    ks = 2 * radius - 1
    out_h = math.ceil(h / stride)
    out_w = math.ceil(w / stride)
    pad_h = max((out_h - 1) * stride + (ks - 1) * dilation + 1 - h, 0)
    pad_w = max(out_w * stride + (ks - 1) * dilation + 1 - w, 0)
    if pad_h > 0 or pad_w > 0:
        x = pad2d(x, (pad_w // 2, pad_w - pad_w // 2,
                      pad_h // 2, pad_h - pad_h // 2))
    return hex_conv2d(x, kernel, bias, even_odd_offset=even_odd_offset,
                      radius=radius, stride=stride, padding=0,
                      dilation=dilation, groups=groups, impl=impl)


# --------------------- cell statistical properties ---------------------
# NaN-aware reductions (HexFrames.py:461-479)

def max_pooling(x, axis=-1):
    return jnp.max(jnp.where(jnp.isnan(x), -jnp.inf, x), axis=axis)


def min_pooling(x, axis=-1):
    return jnp.min(jnp.where(jnp.isnan(x), jnp.inf, x), axis=axis)


def average_pooling(x, axis=-1):
    nan = jnp.isnan(x)
    count = jnp.sum(~nan, axis=axis)
    total = jnp.sum(jnp.where(nan, 0, x), axis=axis)
    return jnp.where(count == 0, jnp.nan, total / jnp.maximum(count, 1))


_REDUCTIONS = {"max": max_pooling, "min": min_pooling, "average": average_pooling}


def _reduction(method: str):
    if method == "centroid":
        raise NotImplementedError(
            "'centroid' pooling is declared but undefined in the reference "
            "(HexFrames.py:360,408 reference a non-existent centroid_pooling)")
    return _REDUCTIONS[method]


def hex_pool2d(x, method: str, kernel_size=2, stride=None, padding: int = 0,
               even_odd_offset: int = 0, padding_mode: str = "constant",
               padding_value=0, ceil_mode: bool = False,
               count_include_pad: bool = True, data_format: str = "NCHW"):
    """Strided pooling on the brick lattice via window gather
    (``HexFrames.py:286-336``), incl. the reference's exact ceil-mode
    bookkeeping (whose ph/pw pads land on width/height respectively,
    ``HexFrames.py:294-299`` — replicated).

    ``data_format="NHWC"`` pools (B, H, W, C) arrays natively (the layout
    the packed conv stack packs from with zero transposes — model stages
    chain in NHWC to avoid the NCHW<->NHWC relayout per stage, PERF.md);
    the brick-lattice window math is identical, only the axes move.
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    _reduction(method)  # validate method early (clear centroid/KeyError)
    if data_format not in ("NCHW", "NHWC"):
        raise ValueError(f"data_format must be NCHW or NHWC, got "
                         f"{data_format!r}")
    nhwc = data_format == "NHWC"
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kh, kw = kernel_size
    if stride is None:
        stride = kernel_size
    if isinstance(stride, int):
        stride = (stride, stride)
    sh, sw = stride

    ax_h, ax_w = (1, 2) if nhwc else (2, 3)
    if not nhwc:
        x = pad2d(x, padding, padding_mode, padding_value)
    else:
        if isinstance(padding, int):
            l = r = t = bm = padding
        else:
            l, r, t, bm = padding
        if l or r or t or bm:
            pw = [(0, 0)] * x.ndim
            pw[ax_h], pw[ax_w] = (t, bm), (l, r)
            jmode = _PAD_MODES[padding_mode]
            x = (jnp.pad(x, pw, mode="constant",
                         constant_values=padding_value)
                 if jmode == "constant" else jnp.pad(x, pw, mode=jmode))
    h, w = x.shape[ax_h], x.shape[ax_w]
    hn = h // sh
    wn = (w - sw // 2 - sw) // sw + 1
    if ceil_mode:
        ph = (kh - h + hn * sh) % kh
        pw_ = (kw - w + (wn * sw + sw // 2)) % kw
        fill = 0.0 if count_include_pad else jnp.nan
        pads = [(0, 0)] * x.ndim
        # reference quirk replicated: pw pads height, ph pads width
        pads[ax_h], pads[ax_w] = (0, pw_), (0, ph)
        x = jnp.pad(x, pads, constant_values=fill)
        h, w = x.shape[ax_h], x.shape[ax_w]
    hn = (h - kh) // sh + 1
    wn = (w - sw // 2) // sw

    # Window positions (reference formulas): window (gi, gj) reads rows
    # sh*gi + [0, kh) and cols (gi % 2)*(sw//2) + sw*gj + [0, kw).
    half = sw // 2
    max_i = sh * (hn - 1) + kh - 1
    max_j = (half if hn > 1 else 0) + sw * (wn - 1) + kw - 1
    if max_i >= h or max_j >= w:
        raise ValueError(
            f"pooling window exceeds input: kernel {kernel_size}, stride "
            f"{stride} on ({h}, {w}) (the reference indexes out of bounds "
            "here as well, HexFrames.py:330-331)")
    return _hex_window_reduce(x, method, hn, wn, kh, kw, sh, sw, half,
                              nhwc=nhwc)


def _hex_window_reduce(x, method, hn, wn, kh, kw, sh, sw, half,
                       nhwc: bool = False):
    """Reduce brick-lattice pooling windows — window (gi, gj) covers rows
    ``sh*gi + [0, kh)`` and cols ``(gi % 2)*half + sw*gj + [0, kw)`` —
    using STATIC STRIDED SLICES, not an advanced-indexing gather: XLA
    lowers large arbitrary gathers to a per-element scalar loop on TPU
    (PERF.md), which made this pooling a hidden cost of every model
    stage.  For a fixed in-window offset (li, lj) and output-row parity
    p, the source pixels form a strided grid — rows ``sh*(p + 2t) + li``,
    cols ``p*half + sw*gj + lj`` — so each (p, li, lj) is one strided
    slice; reduce per parity, then interleave the two parities' rows.

    For max/min with non-overlapping windows (kh <= sh and kw <= sw — the
    universal model pool) a fully-fused two-stage form is used instead:
    the parity split, the 6-D window transpose, and the final row
    interleave each cost a whole-tensor relayout pass on TPU, which made
    pooling ~2/3 of HexCNN-512² inference time.  Since max/min commute
    with any reduction order, reduce rows first (contiguous reshape),
    apply the odd-row column offset as a shift+select (one VPU pass — no
    per-parity tensors), then reduce columns (contiguous reshape).  NaNs
    are mapped to ∓inf up front, exactly as ``max_pooling``/``min_pooling``
    do per-window.  'average' stays on the window-flat path: two-stage
    summation reassociates floating-point adds and would break bit
    equality with the reference goldens.  (``lax.reduce_window`` over
    parity-pre-shifted rows was A/B'd against this form on v5e and LOST —
    interleaved in-process reps: FULL HexCNN-512² 16.6–16.9 ms vs
    14.3–14.8 ms, isolated C=64 pool ~15% slower — XLA's reduce_window
    lowering re-materialises the shifted operand; measured refusal,
    PERF.md pooling section.)"""
    reduce_fn = _REDUCTIONS[method]
    if method in ("max", "min") and kh <= sh and kw <= sw:
        b = x.shape[0]
        if nhwc:
            h, w, c = x.shape[1:]
        else:
            c, h, w = x.shape[1:]
        ax_h, ax_w = (1, 2) if nhwc else (2, 3)
        fill = -jnp.inf if method == "max" else jnp.inf
        op = jnp.max if method == "max" else jnp.min
        z = jnp.where(jnp.isnan(x), fill, x)
        fillv = jnp.asarray(fill, z.dtype)

        def pad_axis(v, axis, amount):
            pads = [(0, 0)] * v.ndim
            pads[axis] = (0, amount)
            return jnp.pad(v, pads, constant_values=fillv)

        ext = sh * hn
        if ext > h:
            z = pad_axis(z, ax_h, ext - h)
        if nhwc:
            z = op(z[:, :ext].reshape(b, hn, sh, w, c)[:, :, :kh], axis=2)
        else:
            z = op(z[:, :, :ext].reshape(b, c, hn, sh, w)[:, :, :, :kh],
                   axis=3)
        # z: (b, hn, w, c) NHWC / (b, c, hn, w) NCHW
        if half:
            if nhwc:
                z_odd = pad_axis(z[:, :, half:], ax_w, half)
                odd = (jnp.arange(hn) % 2 == 1).reshape(1, hn, 1, 1)
            else:
                z_odd = pad_axis(z[..., half:], ax_w, half)
                odd = (jnp.arange(hn) % 2 == 1).reshape(1, 1, hn, 1)
            z = jnp.where(odd, z_odd, z)
        ext = sw * wn
        if ext > w:
            z = pad_axis(z, ax_w, ext - w)
        if nhwc:
            return op(z[:, :, :ext].reshape(
                b, hn, wn, sw, c)[:, :, :, :kw], axis=3)
        return op(z[..., :ext].reshape(b, c, hn, wn, sw)[..., :kw], axis=-1)
    if nhwc:
        # general/'average' windows, NHWC-native (round 5, VERDICT r4 weak
        # #7: the old NCHW round trip cost two whole-tensor transposes on
        # the model layout).  Identical window math with channels riding
        # the lane dim; the window-flat axis lands second-to-last so the
        # per-element reduction order — hence 'average' bit-equality with
        # the NCHW/golden path — is unchanged (kh-major, kw-minor).
        b = x.shape[0]
        h, w, c = x.shape[1:]
        n_rows = (-(-hn // 2), hn // 2)
        reduced = []
        for p in (0, 1):
            n_p = n_rows[p]
            if n_p == 0:
                reduced.append(None)
                continue
            if kh <= sh:
                lo = sh * p
                ext = 2 * sh * n_p
                xr = x if lo + ext <= h else jnp.pad(
                    x, ((0, 0), (0, lo + ext - h), (0, 0), (0, 0)))
                rows = xr[:, lo:lo + ext].reshape(
                    b, n_p, 2 * sh, w, c)[:, :, :kh]
            else:
                rows = jnp.stack(
                    [x[:, sh * p + li:sh * p + li + 2 * sh * (n_p - 1) + 1:
                       2 * sh] for li in range(kh)], axis=2)
            # rows: (b, n_p, kh, w, c)
            c0 = p * half
            if kw <= sw:
                ext = sw * wn
                if c0 + ext > w:
                    rows = jnp.pad(
                        rows, ((0, 0), (0, 0), (0, 0),
                               (0, c0 + ext - w), (0, 0)))
                cols = rows[:, :, :, c0:c0 + ext].reshape(
                    b, n_p, kh, wn, sw, c)[:, :, :, :, :kw]
            else:
                cols = jnp.stack(
                    [rows[:, :, :, c0 + lj:c0 + lj + sw * (wn - 1) + 1:sw]
                     for lj in range(kw)], axis=4)
            # cols: (b, n_p, kh, wn, kw, c) -> window-flat at axis -2
            win = jnp.moveaxis(cols, 2, 3).reshape(b, n_p, wn, kh * kw, c)
            reduced.append(reduce_fn(win, axis=-2))
        red_e, red_o = reduced
        if red_o is None:
            return red_e
        m = n_rows[1]
        body = jnp.stack([red_e[:, :m], red_o], axis=2)
        body = body.reshape(b, 2 * m, wn, c)
        if n_rows[0] > m:
            body = jnp.concatenate([body, red_e[:, m:]], axis=1)
        return body
    b, c, h, w = x.shape
    n_rows = (-(-hn // 2), hn // 2)            # parity 0 / parity 1 counts
    reduced = []
    for p in (0, 1):
        n_p = n_rows[p]
        if n_p == 0:
            reduced.append(None)
            continue
        # rows -> (b, c, n_p, kh, w).  When kh <= sh the windows' row
        # blocks tile a contiguous span, so one plain slice + reshape
        # replaces kh strided slices (strides on the sublane dim force
        # relayouts); the trailing overhang past h is never read back
        # (sliced off by [:kh]), so zero-pad suffices.
        if kh <= sh:
            lo = sh * p
            ext = 2 * sh * n_p
            xr = x if lo + ext <= h else jnp.pad(
                x, ((0, 0), (0, 0), (0, lo + ext - h), (0, 0)))
            rows = xr[:, :, lo:lo + ext].reshape(
                b, c, n_p, 2 * sh, w)[:, :, :, :kh]
        else:
            rows = jnp.stack(
                [x[:, :, sh * p + li:sh * p + li + 2 * sh * (n_p - 1) + 1:
                   2 * sh] for li in range(kh)], axis=3)
        # cols -> (b, c, n_p, kh, wn, kw).  Same trick on the lane dim
        # (where strided slices are costliest) when kw <= sw.
        c0 = p * half
        if kw <= sw:
            ext = sw * wn
            if c0 + ext > w:
                rows = jnp.pad(
                    rows, ((0, 0), (0, 0), (0, 0), (0, 0),
                           (0, c0 + ext - w)))
            cols = rows[..., c0:c0 + ext].reshape(
                b, c, n_p, kh, wn, sw)[..., :kw]
        else:
            cols = jnp.stack(
                [rows[..., c0 + lj:c0 + lj + sw * (wn - 1) + 1:sw]
                 for lj in range(kw)], axis=-1)
        win = jnp.moveaxis(cols, 3, 4).reshape(b, c, n_p, wn, kh * kw)
        reduced.append(reduce_fn(win))
    red_e, red_o = reduced
    if red_o is None:
        return red_e
    m = n_rows[1]
    body = jnp.stack([red_e[:, :, :m], red_o], axis=3)
    body = body.reshape(b, c, 2 * m, wn)
    if n_rows[0] > m:
        body = jnp.concatenate([body, red_e[:, :, m:]], axis=2)
    return body


def hex_adaptive_pool2d(x, outsize, method: str):
    """Adaptive output-size pooling (``HexFrames.py:344-401``).

    Accepts int or (h, w) — the reference's typecheck rejects lists despite
    documenting them (``HexFrames.py:352-355``); fixed divergence.
    """
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    _reduction(method)  # validate method early
    if isinstance(outsize, int):
        outsize = (outsize, outsize)
    hn, wn = outsize
    b, c, h, w = x.shape
    grid_h = int(h / hn)
    grid_w = int(w / (wn + 0.5)) if grid_h > 1 else int(w / wn)

    # The reference clips window indices to the image (``HexFrames.py:
    # 380-383``); clipping equals edge-replication padding by the maximum
    # overrun, after which the windows are unclipped strided grids and
    # ride the same static-strided-slice reduction as hex_pool2d.
    half = grid_w // 2
    max_i = grid_h * (hn - 1) + grid_h - 1
    max_j = (half if hn > 1 else 0) + grid_w * (wn - 1) + grid_w - 1
    pad_b, pad_r = max(0, max_i - (h - 1)), max(0, max_j - (w - 1))
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r)),
                    mode="edge")
    return _hex_window_reduce(x, method, hn, wn, grid_h, grid_w,
                              grid_h, grid_w, half)


def hex_global_pool2d(x, method: str, data_format: str = "NCHW"):
    """Global pooling over flattened spatial dims (``HexFrames.py:402-414``)."""
    x = jnp.asarray(x)
    while x.ndim < 4:
        x = x[None]
    if data_format == "NHWC":
        # native: reduce the flattened spatial axis with channels on lanes
        # (no transpose; round 5, same change as the NHWC window path)
        b, c = x.shape[0], x.shape[-1]
        return _reduction(method)(x.reshape(b, -1, c), axis=1)
    b, c = x.shape[:2]
    return _reduction(method)(x.reshape(b, c, -1))
