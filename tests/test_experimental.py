"""Parity tests for the archived-ops tier (SURVEY.md C22) against goldens
frozen from the exec'd reference archive."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygrid_tpu.nn import experimental as E
from hygrid_tpu.nn import functional as F

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "experimental_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.mark.parametrize("n,off,s", [(0, 1, 1), (1, 0, 1), (2, 1, 2), (3, 0, 2)])
def test_hex_conv_transpose2d(g, n, off, s):
    k = g[f"convT{n}_kernel"][:, :, 0, :]
    out = np.asarray(E.hex_conv_transpose2d(
        g["x"], k, even_odd_offset=off, radius=2, stride=s))
    np.testing.assert_allclose(out, g[f"convT{n}_out"], atol=1e-5)


def test_hex_conv_transpose_upsamples():
    x = np.ones((1, 2, 6, 6), np.float32)
    k = np.ones((2, 2, 7), np.float32)
    out = E.hex_conv_transpose2d(x, k, even_odd_offset=0, radius=2, stride=2)
    assert out.shape[-2] > 2 * 6 - 4 and out.shape[-1] > 6


@pytest.mark.parametrize("n,u", [(0, 2), (1, 3)])
def test_hex_pixel_shuffle(g, n, u):
    out = np.asarray(E.hex_pixel_shuffle(g[f"ps{n}_x"], u))
    np.testing.assert_allclose(out, g[f"ps{n}_out"], atol=1e-6)


def test_hex_pixel_shuffle_guards():
    with pytest.raises(ValueError):
        E.hex_pixel_shuffle(np.ones((1, 4, 4, 4)), 1)
    with pytest.raises(ValueError):
        E.hex_pixel_shuffle(np.ones((1, 5, 4, 4)), 2)


@pytest.mark.parametrize("n,off", [(0, 0), (1, 1)])
def test_hex_to_square_double_stride(g, n, off):
    out = np.asarray(E.hex_to_square_conv2d_by_double_stride(
        g["x"], g[f"h2s{n}_kernel"], even_odd_offset=off))
    np.testing.assert_allclose(out, g[f"h2s{n}_out"], atol=1e-6)


def test_square_to_hex_double_stride(g):
    out = np.asarray(E.square_to_hex_conv2d_by_double_stride(
        g["s2h_x"], g["s2h_kernel"]))
    np.testing.assert_allclose(out, g["s2h_out"], atol=1e-6)


def test_hex_to_square_original_resolution(g):
    out = np.asarray(E.hex_to_square_original_resolution(
        g["h2so_x"], even_odd_offset=0))
    np.testing.assert_allclose(out, g["h2so_out"], atol=1e-6)


def test_quadtree_pooling(g):
    out = np.asarray(E.quadtree_hex_pooling(g["quad_x"], "max", 0))
    np.testing.assert_allclose(out, g["quad_out"], atol=1e-6)


def test_diamond_pooling_constructible_and_sane():
    """The archive's Dimond_HexPooling cannot be constructed (NameError on
    centroid_pooling, codes:541); ours is the fixed intent."""
    x = np.arange(2 * 12 * 8, dtype=np.float32).reshape(1, 2, 12, 8)
    out = np.asarray(E.diamond_hex_pooling(x, "max"))
    assert out.ndim == 4 and out.shape[:2] == (1, 2)
    # max pooling of positive ramps must pick values from the input
    assert set(np.unique(out)) <= set(np.unique(x)) | {0.0}


def test_im2col_hex_conv2d(g):
    out = np.asarray(E.im2col_hex_conv2d(
        g["im2col_x"], g["im2col_weight"], even_odd_offset=0, kernel_radius=2))
    np.testing.assert_allclose(out, g["im2col_out"], atol=1e-6)


def test_im2col_agrees_with_main_conv():
    """The im2col reference path and the production hex_conv2d must agree
    on their common case (offset so kernel phases align)."""
    rng = np.random.default_rng(3)
    x = rng.random((1, 2, 9, 9)).astype(np.float32)
    k = rng.random((4, 2, 7)).astype(np.float32) - 0.5
    main = np.asarray(F.hex_conv2d(x, k, even_odd_offset=1, radius=2,
                                   impl="direct"))
    # im2col weight layout: (C*kn, O), channel-major
    w = np.transpose(k, (1, 2, 0)).reshape(2 * 7, 4)
    im2col = np.asarray(E.im2col_hex_conv2d(
        x, w, even_odd_offset=1, kernel_radius=2))
    assert main.shape == im2col.shape
    np.testing.assert_allclose(main, im2col, atol=1e-5)


def test_weight_initialisers():
    w = E.hex_to_square_downsample_weight(3, 2)
    assert w.shape == (3, 2, 2)
    np.testing.assert_allclose(np.asarray(w[0]).sum(), 1.0, rtol=1e-6)
    w2 = E.square_downsample_weight(2, 4)
    np.testing.assert_allclose(np.asarray(w2[0]).sum(), 1.0, rtol=1e-6)
    w3 = E.diamond_weight(1)
    np.testing.assert_allclose(np.asarray(w3).sum(), 1.0, rtol=1e-6)


@pytest.mark.parametrize("r,s,off,g", [
    (2, 2, 0, 1), (2, 2, 1, 1), (3, 2, 0, 1), (2, 3, 0, 1),
    (1, 2, 0, 1), (2, 1, 0, 1), (2, 2, 0, 2),
])
def test_transpose_phase_equals_canvas(r, s, off, g):
    """The zero-stuffing-free phase decomposition must be BIT-equal to the
    literal canvas formulation (same conv dtype semantics), forward and
    grad."""
    rng = np.random.default_rng(r * 10 + s + off)
    kn = F.hex_kernel_num(r)
    c, o = 4 * g, 4
    x = jnp.asarray(rng.normal(size=(2, c, 10, 9)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (o, c // g, kn)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)
    ref = E._hex_conv_transpose2d_canvas(
        x, k, b, even_odd_offset=off, radius=r, stride=s, groups=g)
    got = E.hex_conv_transpose2d(
        x, k, b, even_odd_offset=off, radius=r, stride=s, groups=g,
        impl="phase")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    ga = jax.grad(lambda xx, kk: jnp.sum(E.hex_conv_transpose2d(
        xx, kk, b, even_odd_offset=off, radius=r, stride=s, groups=g,
        impl="phase") ** 2), argnums=(0, 1))(x, k)
    gb = jax.grad(lambda xx, kk: jnp.sum(E._hex_conv_transpose2d_canvas(
        xx, kk, b, even_odd_offset=off, radius=r, stride=s,
        groups=g) ** 2), argnums=(0, 1))(x, k)
    for t1, t2 in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   rtol=1e-5, atol=1e-5)


def test_transpose_impl_validation():
    x = np.ones((1, 4, 8, 8), np.float32)
    k = np.ones((4, 4, 7), np.float32)
    with pytest.raises(ValueError, match="unknown impl"):
        E.hex_conv_transpose2d(x, k, radius=2, stride=2, impl="bogus")
    with pytest.raises(ValueError, match="unknown data_format"):
        E.hex_conv_transpose2d(x, k, radius=2, stride=2, data_format="NCWH")


@pytest.mark.parametrize("r,s,off,g", [
    (2, 2, 0, 1), (2, 2, 1, 1), (3, 2, 0, 1), (2, 3, 0, 1),
    (1, 2, 0, 1), (2, 1, 0, 1), (2, 2, 0, 2),
])
def test_transpose_matmul_equals_canvas(r, s, off, g):
    """The shifted-matmul executor of the phase plan (the ``auto``
    default) matches the literal canvas formulation, forward and grad,
    and its NHWC entry is bit-equal to its own NCHW entry."""
    rng = np.random.default_rng(r * 10 + s + off)
    kn = F.hex_kernel_num(r)
    c, o = 4 * g, 4
    x = jnp.asarray(rng.normal(size=(2, c, 10, 9)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (o, c // g, kn)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)
    ref = E._hex_conv_transpose2d_canvas(
        x, k, b, even_odd_offset=off, radius=r, stride=s, groups=g)
    got = E.hex_conv_transpose2d(
        x, k, b, even_odd_offset=off, radius=r, stride=s, groups=g,
        impl="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    nhwc = E.hex_conv_transpose2d(
        jnp.moveaxis(x, 1, -1), k, b, even_odd_offset=off, radius=r,
        stride=s, groups=g, impl="matmul", data_format="NHWC")
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(nhwc, -1, 1)),
                                  np.asarray(got))

    ga = jax.grad(lambda xx, kk: jnp.sum(E.hex_conv_transpose2d(
        xx, kk, b, even_odd_offset=off, radius=r, stride=s, groups=g,
        impl="matmul") ** 2), argnums=(0, 1))(x, k)
    gb = jax.grad(lambda xx, kk: jnp.sum(E._hex_conv_transpose2d_canvas(
        xx, kk, b, even_odd_offset=off, radius=r, stride=s,
        groups=g) ** 2), argnums=(0, 1))(x, k)
    for t1, t2 in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   rtol=1e-4, atol=1e-4)
