"""Tests for the packed-plane model domain: pack/unpack, the packed-domain
hex max-pool, packed_io conv stacks, and whole chains that never leave the
packed even/odd-row layout (interpret mode on CPU; Mosaic on TPU).

The image-domain twins (``F.hex_pool2d``, image-mode
``hex_conv_stack_pallas``) are the correctness oracles throughout.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygrid_tpu.nn import functional as F
from hygrid_tpu.kernels.conv_pallas import (
    hex_conv_stack_pallas, hex_packed_maxpool2, pack_planes, plane_geometry,
    unpack_planes)


@pytest.mark.parametrize("c,h,w", [
    (16, 8, 13), (32, 16, 17), (64, 12, 16), (128, 10, 9),
])
@pytest.mark.parametrize("nhwc", [True, False])
def test_pack_unpack_roundtrip(c, h, w, nhwc):
    rng = np.random.default_rng(c + h + w)
    shape = (2, h, w, c) if nhwc else (2, c, h, w)
    x = rng.standard_normal(shape).astype(np.float32)
    planes = pack_planes(x, radius=2, nhwc=nhwc)
    q = 128 // c
    _, _, rows_tot, cols_tot = plane_geometry(2, 1, q, h, w)
    assert planes[0].shape == (2, rows_tot, cols_tot, 128)
    back = unpack_planes(planes, w=w, cout=c, radius=2, nhwc=nhwc)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_pack_planes_rejects_bad_channels_and_odd_height():
    with pytest.raises(ValueError, match="channel width"):
        pack_planes(np.ones((1, 8, 8, 5), np.float32), radius=2)
    with pytest.raises(ValueError, match="even image height"):
        pack_planes(np.ones((1, 7, 8, 16), np.float32), radius=2)


@pytest.mark.parametrize("c,h,w", [
    (16, 8, 13), (32, 16, 17), (32, 16, 16), (64, 12, 16),
])
def test_packed_maxpool_matches_image_pool(c, h, w):
    """Packed pool == hex_pool2d('max', k=2, s=2), extra channel slots
    zero (signed data: the lane-selection matmuls must be exact copies,
    not relu-style maxes with 0)."""
    rng = np.random.default_rng(c * h + w)
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    ref = F.hex_pool2d(jnp.moveaxis(jnp.asarray(x), -1, 1), "max",
                       kernel_size=2, stride=2)
    ref = np.moveaxis(np.asarray(ref), 1, -1)
    pooled = hex_packed_maxpool2(pack_planes(x, radius=2), image_width=w,
                                 in_channels=c, radius=2)
    hn, wn = ref.shape[1], ref.shape[2]
    out = np.asarray(unpack_planes(pooled, w=wn, cout=2 * c, radius=2))
    np.testing.assert_allclose(out[:, :hn, :, :c], ref, atol=1e-6)
    assert np.abs(out[..., c:]).max() == 0.0


def test_packed_maxpool_rejects_off_envelope():
    planes = pack_planes(np.ones((1, 8, 8, 128), np.float32), radius=2)
    with pytest.raises(ValueError, match="q >= 2"):
        hex_packed_maxpool2(planes, image_width=8, in_channels=128)
    planes = pack_planes(np.ones((1, 8, 8, 32), np.float32), radius=2)
    with pytest.raises(ValueError, match="out packing"):
        hex_packed_maxpool2(planes, image_width=8, in_channels=32,
                            out_channels=32)
    planes = pack_planes(np.ones((1, 6, 8, 32), np.float32), radius=2)
    with pytest.raises(ValueError, match="pooled height even"):
        hex_packed_maxpool2(planes, image_width=8, in_channels=32)


@pytest.mark.parametrize("c,h,w,r,gn", [
    (32, 16, 17, 2, False),
    (32, 16, 17, 2, True),
    (16, 12, 10, 3, False),
    (128, 10, 9, 2, False),
])
def test_stack_packed_io_matches_image_mode(c, h, w, r, gn):
    rng = np.random.default_rng(c + r)
    kn = F.hex_kernel_num(r)
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    ks = [(rng.standard_normal((c, c, kn)) * 0.1).astype(np.float32)
          for _ in range(2)]
    bs = None if gn else [0.1 * rng.standard_normal(c).astype(np.float32)
                          for _ in range(2)]
    norms = ([("gn", 8, np.ones(c, np.float32), np.zeros(c, np.float32))] * 2
             if gn else None)
    ref = hex_conv_stack_pallas(x, ks, bs, radius=r, data_format="NHWC",
                                norms=norms)
    out = hex_conv_stack_pallas(pack_planes(x, radius=r), ks, bs, radius=r,
                                packed_io=True, image_width=w, in_channels=c,
                                norms=norms)
    got = unpack_planes(out, w=w, cout=c, radius=r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stack_packed_io_validation():
    planes = pack_planes(np.ones((1, 8, 8, 32), np.float32), radius=2)
    k = np.ones((32, 32, 7), np.float32)
    with pytest.raises(ValueError, match="requires image_width"):
        hex_conv_stack_pallas(planes, [k], None, radius=2, packed_io=True)
    with pytest.raises(ValueError, match="does not match"):
        # planes are packed at q=4 (c=32); declaring c=64 implies q=2 and a
        # narrower packed-column layout
        hex_conv_stack_pallas(planes, [np.ones((64, 64, 7), np.float32)],
                              None, radius=2, packed_io=True,
                              image_width=8, in_channels=64)
    with pytest.raises(ValueError, match="incompatible"):
        hex_conv_stack_pallas(planes, [k], None, radius=2, packed_io=True,
                              image_width=8, in_channels=32, fused=True)


def _chain_image(x, ks1, bs1, ks2, r, c):
    """Image-domain oracle: stack -> max-pool -> stack (width doubled via
    zero channel padding, the HexConvStack in<width convention)."""
    a = hex_conv_stack_pallas(x, ks1, bs1, radius=r, data_format="NHWC")
    b = F.hex_pool2d(a, "max", kernel_size=2, stride=2, data_format="NHWC")
    b = jnp.pad(b, ((0, 0), (0, 0), (0, 0), (0, c)))
    return hex_conv_stack_pallas(b, ks2, None, radius=r, data_format="NHWC")


def _chain_packed(x, ks1, bs1, ks2, r, c, w, wn):
    pl = pack_planes(x, radius=r)
    a = hex_conv_stack_pallas(pl, ks1, bs1, radius=r, packed_io=True,
                              image_width=w, in_channels=c)
    b = hex_packed_maxpool2(a, image_width=w, in_channels=c, radius=r)
    d = hex_conv_stack_pallas(b, ks2, None, radius=r, packed_io=True,
                              image_width=wn, in_channels=2 * c)
    return unpack_planes(d, w=wn, cout=2 * c, radius=r)


def test_packed_chain_matches_image_chain():
    """stack -> packed pool -> stack entirely in planes == the image-domain
    chain, forward AND grad (x, layer kernels)."""
    r, c, h, w = 2, 32, 16, 17
    kn = F.hex_kernel_num(r)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    ks1 = [(rng.standard_normal((c, c, kn)) * 0.1).astype(np.float32)
           for _ in range(2)]
    bs1 = [0.1 * rng.standard_normal(c).astype(np.float32) for _ in range(2)]
    c2 = 2 * c
    ks2 = [(rng.standard_normal((c2, c2, kn)) * 0.1).astype(np.float32)
           for _ in range(2)]
    ks2[0][:, c:] = 0.0  # layer-0 in-dim zero padding (in_channels < width)

    ref = _chain_image(jnp.asarray(x), ks1, bs1, ks2, r, c)
    hn, wn = ref.shape[1], ref.shape[2]
    got = _chain_packed(jnp.asarray(x), ks1, bs1, ks2, r, c, w, wn)
    np.testing.assert_allclose(np.asarray(got)[:, :hn], np.asarray(ref),
                               atol=1e-4)

    def loss_img(xi, k0, k20):
        return jnp.sum(_chain_image(xi, [k0, ks1[1]], bs1,
                                    [k20, ks2[1]], r, c) ** 2)

    def loss_packed(xi, k0, k20):
        return jnp.sum(_chain_packed(xi, [k0, ks1[1]], bs1,
                                     [k20, ks2[1]], r, c, w, wn) ** 2)

    args = (jnp.asarray(x), jnp.asarray(ks1[0]), jnp.asarray(ks2[0]))
    ga = jax.grad(loss_packed, argnums=(0, 1, 2))(*args)
    gb = jax.grad(loss_img, argnums=(0, 1, 2))(*args)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def _split_oracle(a, b, kernels, biases, norms_params, r):
    """Concat + per-op chain: the reference semantics of ``extra_input``."""
    from hygrid_tpu.kernels.conv_pallas import _group_norm_nchw
    h = jnp.concatenate([a, b], axis=1)
    for i, k in enumerate(kernels):
        h = F.hex_conv2d(h, jnp.asarray(k),
                         None if biases is None else jnp.asarray(biases[i]),
                         even_odd_offset=0, radius=r, padding=r - 1,
                         impl="auto")
        if norms_params is not None:
            gam, bet = norms_params[i]
            h = _group_norm_nchw(h, 8, jnp.asarray(gam), jnp.asarray(bet))
        h = jnp.maximum(h, 0)
    return h


@pytest.mark.parametrize("c,h,w,gn", [
    (32, 12, 13, True),   # ragged packed tail
    (16, 8, 16, False),
    (64, 10, 9, True),
])
def test_split_input_stack_matches_concat_chain(c, h, w, gn):
    """``extra_input=``: the fused conv(A,Ka)+conv(B,Kb) layer equals the
    chain on the materialised channel concatenation, forward and grad
    (the UNet decoder skip-join pattern)."""
    r = 2
    kn = F.hex_kernel_num(r)
    rng = np.random.default_rng(c + h + w)
    a = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    k0 = jnp.asarray(0.1 * rng.standard_normal((c, 2 * c, kn)), jnp.float32)
    k1 = jnp.asarray(0.1 * rng.standard_normal((c, c, kn)), jnp.float32)
    bs = [jnp.asarray(rng.standard_normal(c), jnp.float32)
          for _ in range(2)]
    norms = norms_params = None
    if gn:
        norms_params = [(rng.standard_normal(c).astype(np.float32) * 0.1 + 1,
                         rng.standard_normal(c).astype(np.float32) * 0.1)
                        for _ in range(2)]
        norms = [("gn", 8, jnp.asarray(g), jnp.asarray(be))
                 for g, be in norms_params]

    def fused(a_, b_, k0_):
        return hex_conv_stack_pallas(a_, [k0_, k1], bs, radius=r,
                                     norms=norms, extra_input=b_)

    ref = _split_oracle(a, b, [k0, k1], bs, norms_params, r)
    np.testing.assert_allclose(np.asarray(fused(a, b, k0)), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    ga = jax.grad(lambda *t: jnp.sum(fused(*t) ** 2),
                  argnums=(0, 1, 2))(a, b, k0)
    gb = jax.grad(
        lambda a_, b_, k0_: jnp.sum(
            _split_oracle(a_, b_, [k0_, k1], bs, norms_params, r) ** 2),
        argnums=(0, 1, 2))(a, b, k0)
    for x_, y_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=1e-3, atol=1e-3)


def test_split_input_stack_nhwc_and_uneven_fallback():
    r, c, h, w = 2, 32, 12, 13
    kn = F.hex_kernel_num(r)
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32)
    k0 = jnp.asarray(0.1 * rng.standard_normal((c, 2 * c, kn)), jnp.float32)
    k1 = jnp.asarray(0.1 * rng.standard_normal((c, c, kn)), jnp.float32)
    ref = _split_oracle(a, b, [k0, k1], None, None, r)

    got = hex_conv_stack_pallas(
        jnp.moveaxis(a, 1, -1), [k0, k1], None, radius=r,
        extra_input=jnp.moveaxis(b, 1, -1), data_format="NHWC")
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(got, -1, 1)),
                               np.asarray(ref), rtol=1e-4, atol=1e-4)

    # uneven channel split (24 + 40): off the fused-kernel envelope, the
    # launcher must route to the equivalent XLA chain, same answer
    a2, b2 = a[:, :24], jnp.concatenate([a[:, 24:], b], axis=1)
    got2 = hex_conv_stack_pallas(a2, [k0, k1], None, radius=r,
                                 extra_input=b2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_split_input_stack_validation():
    k = np.ones((32, 64, 7), np.float32)
    x = np.ones((1, 32, 8, 8), np.float32)
    with pytest.raises(ValueError, match="incompatible"):
        planes = pack_planes(np.moveaxis(x, 1, -1), radius=2)
        hex_conv_stack_pallas(planes, [k], None, radius=2, packed_io=True,
                              image_width=8, in_channels=32, extra_input=x)
    with pytest.raises(ValueError, match="does not match"):
        hex_conv_stack_pallas(x, [k], None, radius=2,
                              extra_input=np.ones((1, 32, 8, 6), np.float32))
    with pytest.raises(ValueError, match="input channels"):
        # kernel expects 64 in-channels but halves are 32+16
        hex_conv_stack_pallas(
            x, [np.ones((32, 48, 7), np.float32)], None, radius=2,
            extra_input=np.ones((1, 32, 8, 8), np.float32))
