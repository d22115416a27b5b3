"""Direct unit tests for the L1 coordinate conventions."""
import numpy as np
import pytest

from hygrid_tpu import lattice


def test_row_shift_rule():
    assert not lattice.row_is_shifted(0, 0)
    assert lattice.row_is_shifted(1, 0)
    assert lattice.row_is_shifted(0, 1)
    assert not lattice.row_is_shifted(1, 1)


def test_cell_centers_shapes_and_shift():
    x, y = lattice.cell_centers(4, 3, 0)
    assert x.shape == y.shape == (4, 3)
    # odd rows shifted +0.5 relative to even rows (offset 0)
    np.testing.assert_allclose(y[1] - y[0], 0.5)
    np.testing.assert_allclose(y[2] - y[0], 0.0)
    # x constant per row, unit pitch
    np.testing.assert_allclose(x[1, 0] - x[0, 0], 1.0)


def test_affine_index_roundtrip():
    """Cell (i, j) of an offset-0 image has affine index
    (i, j + floor((i+1)/2))."""
    h, w = 6, 5
    x, y = lattice.cell_centers(h, w, 0)
    i_, j_ = lattice.affine_index(x, y, h, w)
    for i in range(h):
        for j in range(w):
            assert round(float(i_[i, j]), 6) == i
            assert round(float(j_[i, j]), 6) == j + (i + 1) // 2


def test_hex_neighbors_deskew():
    (i1, j1), (i2, j2), (i3, j3), (i4, j4) = lattice.hex_neighbors(
        np.array([2]), np.array([3]))
    # affine (2,3) -> storage (2, 3 - trunc(3/2)) = (2, 2)
    assert (i1[0], j1[0]) == (2, 2)
    assert (i3[0], j3[0]) == (2, 3)
    assert (i2[0], j2[0]) == (3, 1)
    assert (i4[0], j4[0]) == (3, 2)


def test_trunc_semantics_negative():
    """Reference uses astype(int) = truncation toward zero, NOT floor."""
    a = np.array([-1.5, -0.5, 0.5, 1.5])
    out = lattice._trunc_int(a, np)
    np.testing.assert_array_equal(out, [-1, 0, 0, 1])
    np.testing.assert_array_equal(
        lattice._trunc_div2(np.array([-3, -1, 1, 3]), np), [-1, 0, 0, 1])


def test_barycentric_weights_sum_to_one():
    rng = np.random.default_rng(0)
    x = rng.uniform(-3, 3, 50)
    y = rng.uniform(-3, 3, 50)
    p1 = (x + rng.uniform(0.5, 1, 50), y + rng.uniform(0.5, 1, 50))
    p2 = (x - rng.uniform(0.5, 1, 50), y + rng.uniform(0.5, 1, 50))
    p3 = (x, y - rng.uniform(0.5, 1, 50))
    a, b, g = lattice.triangle_weights_linear(x, y, p1, p2, p3, np)
    np.testing.assert_allclose(a + b + g, 1.0, atol=1e-12)


def test_corner_boxes_are_distinct_per_function():
    """The 0.25-differing constants ARE the spec (SURVEY.md 7.3)."""
    w = lattice.corner_box("warp", 10, 8)
    h2r = lattice.corner_box("hex_to_rect", 10, 8)
    assert w[2] != h2r[2] and abs(w[2] - h2r[2]) == 0.25
    assert lattice.corner_box("hexresize", 10, 8) == w
    with pytest.raises(ValueError):
        lattice.corner_box("nope", 4, 4)


def test_hexspec_padding_parity():
    s = lattice.HexSpec(8, 8, 0)
    assert s.padded(1).even_odd_offset == 1
    assert s.padded(2).even_odd_offset == 0
    assert s.padded(1).height == 10
