"""Tests for exact hex-lattice rotations/reflections."""
import numpy as np
import pytest

import hygrid_tpu as hg


@pytest.fixture
def img():
    return np.arange(1, 1 + 2 * 9 * 7, dtype=np.float32).reshape(2, 9, 7)


def test_k6_is_identity(img):
    out = np.asarray(hg.hexrot60(img, 6))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5])
def test_rotation_preserves_values_exactly(img, k):
    out = np.asarray(hg.hexrot60(img, k))
    src = sorted(img[0].ravel().tolist())
    vals = sorted(v for v in out[0].ravel().tolist() if v != 0)
    assert vals == src  # pure permutation: every value present exactly once


def test_k3_is_point_symmetry_twice(img):
    once = np.asarray(hg.hexrot60(img, 3))
    twice = np.asarray(hg.hexrot60(once, 3, pivot=None))
    # rotating the (larger, zero-padded) canvas by another 180 degrees must
    # bring back every original value
    src = sorted(img[0].ravel().tolist())
    vals = sorted(v for v in twice[0].ravel().tolist() if v != 0)
    assert vals == src


def test_integer_dtype_preserved(img):
    out = hg.hexrot60(img.astype(np.int32), 2)
    assert np.asarray(out).dtype == np.int32


def test_pivot_cell_fixed():
    x = np.zeros((1, 9, 9), np.float32)
    x[0, 4, 4] = 7.0
    out = np.asarray(hg.hexrot60(x, 1, pivot=(4, 4)))
    # the pivot value survives somewhere, and exactly once
    assert (out == 7.0).sum() == 1


def test_flips_are_involutions(img):
    h = np.asarray(hg.hexflip(img, "horizontal"))
    v = np.asarray(hg.hexflip(img, "vertical"))
    np.testing.assert_array_equal(np.asarray(hg.hexflip(h, "horizontal")), img)
    np.testing.assert_array_equal(np.asarray(hg.hexflip(v, "vertical")), img)
    with pytest.raises(ValueError):
        hg.hexflip(img, "diagonal")
