"""Tests for the reference-named module aliases (port by changing the
import root only)."""
import numpy as np
import pytest


def test_geometry_aliases_resolve_to_one_engine():
    from hygrid_tpu import geometry_np, geometry_torch, geometry
    img = np.random.default_rng(0).random((3, 12, 10))
    a = np.asarray(geometry_np.hexresize(img, (8, 6), "linear"))
    b = geometry.hexresize(img, (8, 6), "linear")
    np.testing.assert_allclose(a, np.asarray(b), atol=1e-6)
    g = geometry_torch.hex_to_square_resample(img, (10, 14), "linear",
                                              device="cuda0")
    assert isinstance(g, np.ndarray) and g.shape == (3, 10, 14)


def test_hexframes_alias_names():
    from hygrid_tpu import HexFrames as hnn
    for name in ["HexConv2d", "HexConv2dAdaptivePadding", "HexPool2d",
                 "HexAdaptivePool2d", "HexGlobalPool2d", "pad",
                 "heximage_to_type1", "type1_to_heximage", "max_pooling",
                 "min_pooling", "average_pooling"]:
        assert hasattr(hnn, name), name


def test_hexmodules_alias_registry():
    from hygrid_tpu import HexModules
    assert "HexConv2d" in HexModules.CONV_LAYERS
    conv = HexModules.build_hexconv_layer(None, 3, 6, 0, 2)
    assert conv.out_channels == 6


def test_image_aliases():
    from hygrid_tpu.Image import IMAGE
    from hygrid_tpu.HexImage import HEXIMAGE
    him = HEXIMAGE(data=np.ones((1, 6, 6)))
    assert him.shape == (1, 6, 6)
    im = IMAGE(data=np.ones((1, 4, 4)))
    assert im.shape == (1, 4, 4)


def test_hexpixelart_alias_shader():
    from hygrid_tpu.HexPixelArt.hexagon_mosaic_shader import (
        Hexagon_Mosaic_shader)
    from hygrid_tpu.HexPixelArt import Window, Texture
    sh = Hexagon_Mosaic_shader()
    sh.use()
    sh.setUniform("even_odd_offset", 0)
    sh.setUniform("hexmosaicSizeRatio", 0.5)
    sh.setAttrib("aPos", 3, None, 20, 0)
    out = sh.render(np.ones((3, 8, 8), np.float32), (32, 32))
    assert np.asarray(out).shape == (3, 32, 32)
    tex = Texture(imgarr=np.ones((3, 8, 8)))
    win = Window(32, 32, "t")
    assert win.render_texture(tex).shape == (3, 32, 32)
