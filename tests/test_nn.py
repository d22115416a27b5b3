"""Parity and property tests for the hex NN layer (L3)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import hygrid_tpu.nn as hnn
from hygrid_tpu.nn import functional as F
from tools.make_nn_goldens import CONV_CONFIGS, POOL_CONFIGS, ADAPTIVE_CONV_CONFIGS

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "nn_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.mark.parametrize("impl", ["type1", "direct"])
@pytest.mark.parametrize("n", range(len(CONV_CONFIGS)))
def test_hex_conv2d_golden(g, n, impl):
    r, s, p, d, grp, off, bias = CONV_CONFIGS[n]
    k = g[f"conv{n}_kernel"][:, :, 0, :]
    b = g.get(f"conv{n}_bias")
    out = np.asarray(F.hex_conv2d(
        g["conv_x"], k, b, even_odd_offset=off, radius=r, stride=s,
        padding=p, dilation=d, groups=grp, impl=impl))
    want = g[f"conv{n}_out"]
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=2e-6)


@pytest.mark.parametrize("n", range(len(CONV_CONFIGS)))
def test_conv_output_shape_helper(g, n):
    r, s, p, d, grp, off, bias = CONV_CONFIGS[n]
    want = g[f"conv{n}_out"].shape
    h, w = g["conv_x"].shape[-2:]
    assert F.hex_conv2d_output_shape(h, w, r, s, p, d) == want[-2:]


@pytest.mark.parametrize("n", range(len(POOL_CONFIGS)))
def test_hex_pool2d_golden(g, n):
    meth, k, s, p, off, ceil, cip = POOL_CONFIGS[n]
    out = np.asarray(F.hex_pool2d(
        g["pool_x"], meth, kernel_size=k, stride=s, padding=p,
        even_odd_offset=off, ceil_mode=ceil, count_include_pad=cip))
    want = g[f"pool{n}_out"]
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_pool_strided_slice_matches_gather():
    """The strided-slice window extraction (no TPU scalar-loop gather,
    PERF.md) must be bit-equal to the reference's index-grid gather
    across kernel/stride/ceil/NaN configurations."""
    rng = np.random.default_rng(7)
    for _ in range(25):
        h, w = int(rng.integers(6, 40)), int(rng.integers(6, 40))
        kh, kw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        sh, sw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        cm, cip = bool(rng.integers(0, 2)), bool(rng.integers(0, 2))
        meth = ("max", "min", "average")[int(rng.integers(0, 3))]
        x = rng.random((2, 3, h, w)).astype(np.float32)
        if rng.random() < 0.3:
            x[0, 0, ::5, ::3] = np.nan
        xp = jnp.asarray(x)
        hh, ww = h, w
        hn = hh // sh
        wn = (ww - sw // 2 - sw) // sw + 1
        if cm:
            ph = (kh - hh + hn * sh) % kh
            pw = (kw - ww + (wn * sw + sw // 2)) % kw
            fill = 0.0 if cip else np.nan
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, pw), (0, ph)),
                         constant_values=fill)
            hh, ww = xp.shape[-2:]
        hn = (hh - kh) // sh + 1
        wn = (ww - sw // 2) // sw
        gi, gj = np.meshgrid(np.arange(hn), np.arange(wn), indexing="ij")
        li, lj = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
        ii = (sh * gi)[:, :, None, None] + li[None, None]
        jj = ((gi % 2) * (sw // 2) + gj * sw)[:, :, None, None] + lj[None, None]
        oob = hn < 1 or wn < 1 or ii.max() >= hh or jj.max() >= ww
        if oob:
            with pytest.raises(ValueError):
                F.hex_pool2d(x, meth, (kh, kw), (sh, sw), ceil_mode=cm,
                             count_include_pad=cip)
            continue
        want = F._reduction(meth)(
            xp[:, :, jnp.asarray(ii), jnp.asarray(jj)].reshape(
                2, 3, hn, wn, kh * kw))
        got = F.hex_pool2d(x, meth, (kh, kw), (sh, sw), ceil_mode=cm,
                           count_include_pad=cip)
        assert np.array_equal(np.asarray(got), np.asarray(want),
                              equal_nan=True)


def test_pool_nhwc_matches_nchw():
    """data_format="NHWC" pooling (the layout model stages chain in to
    avoid per-stage relayouts, PERF.md) must be bit-equal to the NCHW
    path under a transpose, across methods/kernels/NaNs."""
    rng = np.random.default_rng(11)
    x = rng.random((2, 3, 40, 36)).astype(np.float32)
    x[0, 1, ::6, ::5] = np.nan
    xt = np.moveaxis(x, 1, -1)
    for meth in ("max", "min", "average"):
        for ks, st in [(2, 2), (3, 3), ((1, 2), (2, 3)), ((3, 2), (1, 2))]:
            a = np.asarray(F.hex_pool2d(x, meth, ks, st))
            b = np.asarray(F.hex_pool2d(xt, meth, ks, st,
                                        data_format="NHWC"))
            assert np.array_equal(a, np.moveaxis(b, -1, 1),
                                  equal_nan=True), (meth, ks, st)
    # ceil-mode + padding through the NHWC bookkeeping
    a = np.asarray(F.hex_pool2d(x, "max", 3, 2, padding=1, ceil_mode=True))
    b = np.asarray(F.hex_pool2d(xt, "max", 3, 2, padding=1, ceil_mode=True,
                                data_format="NHWC"))
    assert np.array_equal(a, np.moveaxis(b, -1, 1), equal_nan=True)
    g1 = np.asarray(F.hex_global_pool2d(x, "average"))
    g2 = np.asarray(F.hex_global_pool2d(xt, "average", data_format="NHWC"))
    np.testing.assert_allclose(g1, g2, rtol=1e-6)


def test_adaptive_pool_matches_clipped_gather():
    """Edge-replication padding + strided slices must equal the
    reference's index clipping (``HexFrames.py:380-383``)."""
    rng = np.random.default_rng(8)
    for _ in range(15):
        h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
        hn = int(rng.integers(1, max(2, h // 2)))
        wn = int(rng.integers(1, max(2, w // 2)))
        meth = ("max", "min", "average")[int(rng.integers(0, 3))]
        x = rng.random((2, 3, h, w)).astype(np.float32)
        grid_h = int(h / hn)
        grid_w = int(w / (wn + 0.5)) if grid_h > 1 else int(w / wn)
        if grid_h < 1 or grid_w < 1:
            continue
        gi, gj = np.meshgrid(np.arange(hn), np.arange(wn), indexing="ij")
        li, lj = np.meshgrid(np.arange(grid_h), np.arange(grid_w),
                             indexing="ij")
        ii = np.clip((grid_h * gi)[:, :, None, None] + li[None, None],
                     0, h - 1)
        jj = np.clip(((gi % 2) * (grid_w // 2) + gj * grid_w)
                     [:, :, None, None] + lj[None, None], 0, w - 1)
        want = F._reduction(meth)(
            jnp.asarray(x)[:, :, jnp.asarray(ii), jnp.asarray(jj)]
            .reshape(2, 3, hn, wn, grid_h * grid_w))
        got = F.hex_adaptive_pool2d(x, (hn, wn), meth)
        assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n", range(len(ADAPTIVE_CONV_CONFIGS)))
def test_adaptive_padding_conv_golden(g, n):
    r, s, p, d, off = ADAPTIVE_CONV_CONFIGS[n]
    k = g[f"aconv{n}_kernel"][:, :, 0, :]
    b = g[f"aconv{n}_bias"]
    # note: p is intentionally NOT applied — the reference ctor discards it
    out = np.asarray(F.hex_conv2d_adaptive_padding(
        g["conv_x"], k, b, even_odd_offset=off, radius=r, stride=s, dilation=d))
    want = g[f"aconv{n}_out"]
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=2e-6)


class TestImplEquivalence:
    """The TPU-native direct path must agree with the reference-mirroring
    type-1 path on every configuration (they are proven-equal algebraic
    forms; this guards the bookkeeping)."""

    @pytest.mark.parametrize("r,s,p,d,grp,off", [
        (1, 1, 0, 1, 1, 0), (2, 1, 0, 1, 1, 1), (3, 3, 2, 1, 1, 0),
        (2, 2, 1, 3, 1, 1), (2, 1, 0, 1, 4, 0), (5, 1, 4, 1, 1, 0),
    ])
    def test_direct_equals_type1(self, r, s, p, d, grp, off):
        rng = np.random.default_rng(r * 100 + s * 10 + p)
        cin, cout = 4, 8
        x = rng.random((1, cin, 21, 17)).astype(np.float32)
        k = rng.random((cout, cin // grp, F.hex_kernel_num(r))).astype(np.float32) - 0.5
        a = np.asarray(F.hex_conv2d(x, k, even_odd_offset=off, radius=r,
                                    stride=s, padding=p, dilation=d,
                                    groups=grp, impl="type1"))
        b = np.asarray(F.hex_conv2d(x, k, even_odd_offset=off, radius=r,
                                    stride=s, padding=p, dilation=d,
                                    groups=grp, impl="direct"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestLayers:
    def test_hexconv_module_init_and_apply(self):
        m = hnn.HexConv2d(in_channels=3, out_channels=8, even_odd_offset=0,
                          hexkernel_radius=2, stride=2, padding=1)
        x = jnp.ones((2, 3, 16, 16))
        params = m.init(jax.random.key(0), x)
        k = params["params"]["kernel"]
        assert k.shape == (8, 3, 7)  # kernelnum(r=2) = 7
        # kaiming bound = 1/sqrt(fan_in)
        bound = 1.0 / np.sqrt(3 * 7)
        assert float(jnp.abs(k).max()) <= bound
        out = m.apply(params, x)
        assert out.shape[0:2] == (2, 8)

    def test_hexconv_gradients(self):
        m = hnn.HexConv2d(in_channels=2, out_channels=4, even_odd_offset=0,
                          hexkernel_radius=2)
        x = jnp.ones((1, 2, 12, 12))
        params = m.init(jax.random.key(1), x)

        def loss(p):
            return jnp.sum(m.apply(p, x) ** 2)

        grads = jax.grad(loss)(params)
        gk = grads["params"]["kernel"]
        assert gk.shape == params["params"]["kernel"].shape
        assert bool(jnp.any(gk != 0))

    def test_adaptive_padding_keeps_size_stride1(self):
        m = hnn.HexConv2dAdaptivePadding(
            in_channels=3, out_channels=5, even_odd_offset=0,
            hexkernel_radius=2, stride=1)
        x = jnp.ones((1, 3, 20, 20))
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        # height preserved; width is input+1 by the reference's own
        # output_w (not output_w - 1) rule, HexFrames.py:244-246
        assert out.shape == (1, 5, 20, 21)

    def test_adaptive_padding_halves_stride2(self):
        m = hnn.HexConv2dAdaptivePadding(
            in_channels=3, out_channels=5, even_odd_offset=0,
            hexkernel_radius=2, stride=2)
        x = jnp.ones((1, 3, 20, 20))
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out.shape == (1, 5, 10, 10)

    def test_pool_layer_callable(self):
        pool = hnn.HexPool2d("max", kernel_size=2, stride=2)
        out = pool(jnp.ones((1, 3, 12, 12)))
        assert out.shape[:2] == (1, 3)

    def test_pool_default_stride_fixed(self):
        """stride=None works here; the reference crashes
        (HexFrames.py:277)."""
        pool = hnn.HexPool2d("average", kernel_size=2)
        out = pool(jnp.ones((1, 1, 8, 8)))
        assert out.shape[:2] == (1, 1)

    def test_global_and_adaptive_pool_constructible(self):
        """The reference raises NameError on ANY construction of these
        (HexFrames.py:357-360,405-408); fixed divergence."""
        gp = hnn.HexGlobalPool2d("average")
        out = gp(jnp.arange(24.0).reshape(1, 2, 3, 4))
        np.testing.assert_allclose(np.asarray(out)[0, 0], 5.5)
        ap = hnn.HexAdaptivePool2d(2, "max")
        out = ap(jnp.ones((1, 2, 8, 9)))
        assert out.shape == (1, 2, 2, 2)

    def test_centroid_pooling_clear_error(self):
        with pytest.raises(NotImplementedError):
            hnn.HexPool2d("centroid")


class TestReductions:
    def test_nan_aware(self):
        x = jnp.array([[1.0, jnp.nan, 3.0], [jnp.nan, jnp.nan, jnp.nan]])
        np.testing.assert_allclose(np.asarray(F.max_pooling(x)), [3.0, -np.inf])
        np.testing.assert_allclose(np.asarray(F.min_pooling(x)), [1.0, np.inf])
        avg = np.asarray(F.average_pooling(x))
        np.testing.assert_allclose(avg[0], 2.0)
        assert np.isnan(avg[1])

    def test_pool_jit_compatible(self):
        @jax.jit
        def f(x):
            return F.hex_pool2d(x, "max", kernel_size=2, stride=2)

        out = f(jnp.ones((1, 2, 8, 8)))
        assert out.shape[:2] == (1, 2)
