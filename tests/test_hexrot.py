"""Tests for exact hex-lattice rotations/reflections and augmentation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


class TestAugment:
    """Hex-native augmentation ops (ops/augment.py) — beyond-parity: the
    reference ships no augmentation; rect-style rot90/odd crops are wrong
    on brick-wall storage."""

    def _disk(self, n=17, seed=0):
        rng = np.random.default_rng(seed)
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        disk = ((ii - n // 2) ** 2 + (jj - n // 2) ** 2) <= (n // 4) ** 2
        return jnp.asarray(np.where(disk, rng.random((n, n)), 0.0),
                           jnp.float32)[None]

    def test_same_canvas_rotation_exact_and_invertible(self):
        import hygrid_tpu as hg
        x = self._disk()
        np.testing.assert_array_equal(np.asarray(hg.hexrot60_same(x, 0)),
                                      np.asarray(x))
        for k in range(1, 6):
            r = hg.hexrot60_same(x, k)
            back = hg.hexrot60_same(r, 6 - k)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
            np.testing.assert_allclose(float(jnp.sum(r)), float(jnp.sum(x)),
                                       rtol=1e-5)

    def test_same_canvas_integer_dtype_preserved(self):
        import hygrid_tpu as hg
        x = (np.asarray(self._disk()[0]) * 255).astype(np.uint8)[None]
        r = hg.hexrot60_same(jnp.asarray(x), 2)
        assert r.dtype == jnp.uint8
        back = hg.hexrot60_same(r, 4)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_random_rot_traced_k_under_jit(self):
        import hygrid_tpu as hg
        xs = jnp.stack([self._disk(seed=s)[0] for s in range(4)])[:, None]
        out = jax.jit(hg.random_hexrot60)(jax.random.key(0), xs)
        assert out.shape == xs.shape
        out2 = jax.jit(hg.random_hexrot60)(jax.random.key(0), xs)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        # per-image sums preserved (rotation is a permutation of the disk)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(out, axis=(1, 2, 3))),
            np.asarray(jnp.sum(xs, axis=(1, 2, 3))), rtol=1e-5)

    def test_random_flip_extremes(self):
        import hygrid_tpu as hg
        xs = jnp.asarray(np.random.default_rng(1).random((3, 2, 8, 8)),
                         jnp.float32)
        none = hg.random_hexflip(jax.random.key(0), xs, p=0.0)
        np.testing.assert_array_equal(np.asarray(none), np.asarray(xs))
        allf = hg.random_hexflip(jax.random.key(0), xs, p=1.0)
        np.testing.assert_array_equal(np.asarray(allf),
                                      np.asarray(xs[..., :, ::-1]))

    def test_random_translate_parity_and_zero_fill(self):
        import hygrid_tpu as hg
        from hygrid_tpu.nn import functional as F
        xs = jnp.asarray(np.random.default_rng(2).random((6, 1, 12, 12)),
                         jnp.float32)
        out = hg.random_hex_translate(jax.random.key(3), xs, max_shift=2)
        assert out.shape == xs.shape
        # row shifts are even: every output row pattern must align with the
        # source parity — verify by locating the shift of image 0 exactly
        x0, o0 = np.asarray(xs[0, 0]), np.asarray(out[0, 0])
        hits = [(dy, dx)
                for dy in range(-4, 5) for dx in range(-2, 3)
                if dy % 2 == 0
                and np.array_equal(
                    o0[max(dy, 0):12 + min(dy, 0), max(dx, 0):12 + min(dx, 0)],
                    x0[max(-dy, 0):12 - max(dy, 0), max(-dx, 0):12 - max(dx, 0)])]
        assert hits, "no even-row translation explains the output"
        # max_shift=0 is the identity
        ident = hg.random_hex_translate(jax.random.key(4), xs, max_shift=0)
        np.testing.assert_array_equal(np.asarray(ident), np.asarray(xs))

    def test_augment_batch_jit(self):
        import hygrid_tpu as hg
        xs = jnp.stack([self._disk(seed=s)[0] for s in range(4)])[:, None]
        f = jax.jit(lambda k, v: hg.augment_hex_batch(k, v, translate=1))
        out = f(jax.random.key(5), xs)
        assert out.shape == xs.shape and np.isfinite(np.asarray(out)).all()
