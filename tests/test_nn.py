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
