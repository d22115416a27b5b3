"""Independent, deliberately naive per-pixel oracle for hex-lattice sampling.

This is a from-first-principles scalar-loop implementation of the documented
sampling spec (SURVEY.md section 2.1), used to cross-check the vectorised
engine — including the code paths whose reference counterparts are broken
(hex-source 'nearest').  It shares no code with ``hygrid_tpu``.
"""
import math

import numpy as np


def _trunc(v):
    return int(v)  # python int() truncates toward zero, like astype(int)


def hex_sample_point(img_hw_c, x, y, method):
    """Sample one Cartesian point from a hex image given as (H, W, C)."""
    h, w, c = img_hw_c.shape
    i_ = x + (h - 1) * 0.5
    j_ = 0.5 * i_ + y + (w - 0.5) * 0.5
    i_n, j_n = _trunc(i_), _trunc(j_)
    i_f, j_f = i_ - i_n, j_ - j_n

    def deskew(ii, jj):
        return ii, jj - _trunc((ii + 1) / 2)

    n1 = deskew(i_n, j_n)
    n2 = deskew(i_n + 1, j_n)         # next-row left
    n3 = deskew(i_n, j_n + 1)         # same-row right
    n4 = deskew(i_n + 1, j_n + 1)

    def value(ij):
        i, j = ij
        if 0 <= i < h and 0 <= j < w:
            return img_hw_c[i, j].astype(np.float64)
        return np.zeros(c)

    flag = i_f > j_f
    p2_idx = n2 if flag else n3

    # vertex cartesian coordinates (offset-0 lattice)
    def cart(ai, aj):
        return (ai - (h - 1) / 2.0, aj - ai / 2.0 - (w - 0.5) / 2.0)

    p1 = cart(i_n, j_n)
    p2 = cart(i_n + (1 if flag else 0), j_n + (0 if flag else 1))
    p3 = cart(i_n + 1, j_n + 1)

    v1, v2, v3 = value(n1), value(p2_idx), value(n4)

    if method == "linear":
        def area(a, b, cc):
            return 0.5 * abs((a[0] - b[0]) * (a[1] - cc[1]) - (a[1] - b[1]) * (a[0] - cc[0]))
        p = (x, y)
        s1 = area(p, p2, p3)
        s2 = area(p, p1, p3)
        s3 = area(p, p1, p2)
        tot = s1 + s2 + s3
        return (s1 * v1 + s2 * v2 + s3 * v3) / tot
    if method == "nearest":
        ds = [
            (x - p1[0]) ** 2 + (y - p1[1]) ** 2,
            (x - p2[0]) ** 2 + (y - p2[1]) ** 2,
            (x - p3[0]) ** 2 + (y - p3[1]) ** 2,
        ]
        return [v1, v2, v3][int(np.argmin(ds))]
    if method == "bilinear":
        # method 2: two-stage lerp over the affine parallelogram of all 4
        # de-skewed neighbours, weighted by the affine fractional parts
        low = (1 - i_f) * value(n1) + i_f * value(n2)
        high = (1 - i_f) * value(n3) + i_f * value(n4)
        return (1 - j_f) * low + j_f * high
    raise ValueError(method)


def hex_sample_grid(img_chw, xs, ys, method):
    """Sample a grid of points; xs/ys are (h1, w1)."""
    img = np.moveaxis(np.asarray(img_chw, dtype=np.float64), 0, -1)
    h1, w1 = xs.shape
    out = np.zeros((h1, w1, img.shape[-1]))
    for a in range(h1):
        for b in range(w1):
            out[a, b] = hex_sample_point(img, xs[a, b], ys[a, b], method)
    return np.moveaxis(out, -1, 0)


def hexresize_oracle(img_chw, dsize, method):
    c, h, w = img_chw.shape
    h1, w1 = dsize
    h_inf, h_sup = -(h / 2 - 0.5), h / 2 - 0.5
    w_inf, w_sup = -((w + 0.5) / 2 - 0.5), (w + 0.5) / 2 - 0.5
    xs, ys = np.meshgrid(np.linspace(h_inf, h_sup, h1),
                         np.linspace(w_inf, w_sup, w1), indexing="ij")
    return hex_sample_grid(img_chw, xs, ys, method)


def hex_to_rect_oracle(img_chw, dsize, method):
    c, h, w = img_chw.shape
    h1, w1 = dsize
    h_inf, h_sup = -(h / 2 - 0.5), h / 2 - 0.5
    w_inf, w_sup = -((w + 0.5) / 2 - 0.75), (w + 0.5) / 2 - 0.75
    xs, ys = np.meshgrid(np.linspace(h_inf, h_sup, h1),
                         np.linspace(w_inf, w_sup, w1), indexing="ij")
    return hex_sample_grid(img_chw, xs, ys, method)


def warp_oracle(img_chw, H, method):
    c, h, w = img_chw.shape
    corners = np.array([
        [-(h / 2 - 0.5), -((w + 0.5) / 2 - 0.5), 1.0],
        [-(h / 2 - 0.5), (w + 0.5) / 2 - 0.5, 1.0],
        [h / 2 - 0.5, -((w + 0.5) / 2 - 0.5), 1.0],
        [h / 2 - 0.5, (w + 0.5) / 2 - 0.5, 1.0],
    ]).T
    nc = H @ corners
    hh = np.arange(nc[0].min(), nc[0].max() + 1, 1.0)
    ww = np.arange(nc[1].min(), nc[1].max() + 0.5, 1.0)
    xs, ys = np.meshgrid(hh, ww, indexing="ij")
    ys = ys.copy()
    ys[1::2] += 0.5
    inv = np.linalg.inv(H)
    pts = np.einsum("ij,jkl->ikl",
                    inv, np.stack([xs, ys, np.ones_like(xs)], axis=0))
    return hex_sample_grid(img_chw, pts[0], pts[1], method)
