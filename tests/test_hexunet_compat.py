"""Tests for the HexUNet segmentation family and the compat shim layer."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygrid_tpu.models import HexUNet, create_train_state, train_step
import hygrid_tpu.compat as compat


class TestHexUNet:
    @pytest.mark.parametrize("upsample", ["transpose", "pixelshuffle"])
    def test_forward_shapes(self, upsample):
        model = HexUNet(num_classes=5, widths=(8, 16), radius=2,
                        upsample=upsample)
        x = jnp.ones((2, 3, 32, 32))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 5, 32, 32)

    def test_trains(self):
        import optax
        model = HexUNet(num_classes=3, widths=(8, 16), radius=2, norm=None)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 3, 16, 16)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 3, (2, 16, 16)))
        params = model.init(jax.random.key(0), x)

        def loss_fn(p):
            logits = model.apply(p, x)                 # (B, C, H, W)
            logits = jnp.moveaxis(logits, 1, -1)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        opt = optax.adam(1e-2)
        st = opt.init(params)
        l0 = None
        step = jax.jit(lambda p, s: _step(p, s))

        def _step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l

        for i in range(6):
            params, st, l = step(params, st)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0


class TestCompat:
    def test_names_one_to_one(self):
        rng = np.random.default_rng(0)
        img = rng.random((3, 12, 10))
        out = compat.hex_to_square_resample(img, (14, 16), "linear")
        assert isinstance(out, np.ndarray) and out.shape == (3, 14, 16)
        ref = np.asarray(compat.hex_to_rect_resample(img, (14, 16), "linear"))
        np.testing.assert_allclose(out, ref)

        H = np.diag([1.5, 1.5, 1.0])
        g = compat.image_geometric_transformation_gpu(img, H, "linear",
                                                      device="cuda0")
        c = compat.image_geometric_transformation_cpu(img, H, "linear")
        np.testing.assert_allclose(g, c)
        assert isinstance(g, np.ndarray)

    def test_class_shims(self):
        assert compat.IMAGE is not None and compat.HEXIMAGE is not None
        him = compat.HEXIMAGE(data=np.ones((1, 6, 6)))
        assert him.shape == (1, 6, 6)

    def test_top_level_exposure(self):
        import hygrid_tpu as hg
        assert hg.compat.hex_to_square_resample is compat.hex_to_square_resample
