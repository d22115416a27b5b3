"""AOT export (utils/export.py): serialize -> load -> run, no model code.

Runs on CPU; the artifact bakes the exporting process's trace (XLA routes
on CPU), which is exactly the cross-platform caveat the module documents.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hygrid_tpu.utils.export import (export_fn, export_inference,
                                     save_exported, load_exported,
                                     exported_info)


def test_export_fn_roundtrip_geometry(tmp_path):
    """A hexify+filter pipeline exports, serializes, reloads, and matches."""
    from hygrid_tpu.models.train import hexify_batch

    def pipe(x):
        h = hexify_batch(x)
        return jnp.tanh(h) * 2.0

    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 32, 32)),
                    jnp.float32)
    exp = export_fn(pipe, (x,))
    p = str(tmp_path / "pipe.jaxexp")
    save_exported(p, exp)
    fn = load_exported(p)
    # reference is the jitted pipeline: eager resample weights can round
    # boundary ties differently from the compiled artifact
    np.testing.assert_allclose(np.asarray(fn(x)),
                               np.asarray(jax.jit(pipe)(x)), rtol=1e-6)


def test_export_inference_params_baked(tmp_path):
    """hexcnn_tiny inference artifact needs neither params nor model code."""
    from hygrid_tpu.models import hexcnn_tiny
    from hygrid_tpu.models.train import hexify_batch

    model = hexcnn_tiny(num_classes=5)
    x = jnp.asarray(np.random.default_rng(1).random((2, 3, 32, 32)),
                    jnp.float32)
    params = model.init(jax.random.key(0), hexify_batch(x))
    exp = export_inference(model, params, x)
    p = str(tmp_path / "hexcnn.jaxexp")
    save_exported(p, exp)

    fn = load_exported(p)
    got = np.asarray(fn(x))
    want = np.asarray(model.apply(params, hexify_batch(x)))
    assert got.shape == (2, 5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    info = exported_info(p)
    assert info["platforms"] == ["cpu"]
    assert "2,3,32,32" in info["in_avals"][0].replace(" ", "")


def test_export_symbolic_batch(tmp_path):
    """One artifact serves any batch size when symbolic_batch=True."""
    from hygrid_tpu.models.train import hexify_batch

    def pipe(x):
        return jnp.sum(hexify_batch(x), axis=(1, 2, 3))

    x1 = jnp.asarray(np.random.default_rng(2).random((1, 3, 16, 16)),
                     jnp.float32)
    exp = export_fn(pipe, (x1,), symbolic_batch=True)
    p = str(tmp_path / "sym.jaxexp")
    save_exported(p, exp)
    fn = load_exported(p)
    for b in (1, 3, 7):
        xb = jnp.asarray(np.random.default_rng(b).random((b, 3, 16, 16)),
                         jnp.float32)
        np.testing.assert_allclose(np.asarray(fn(xb)), np.asarray(pipe(xb)),
                                   rtol=1e-5)


def test_export_inference_symbolic_batch_model(tmp_path):
    """Symbolic batch composes with a real model's inference path."""
    from hygrid_tpu.models import hexcnn_tiny
    from hygrid_tpu.models.train import hexify_batch

    model = hexcnn_tiny(num_classes=3)
    x = jnp.asarray(np.random.default_rng(3).random((2, 3, 32, 32)),
                    jnp.float32)
    params = model.init(jax.random.key(0), hexify_batch(x))
    try:
        exp = export_inference(model, params, x, symbolic_batch=True)
    except Exception as e:  # pragma: no cover - document-if-unsupported
        pytest.skip(f"symbolic batch unsupported on this route: {e}")
    p = str(tmp_path / "sym_model.jaxexp")
    save_exported(p, exp)
    fn = load_exported(p)
    for b in (1, 4):
        xb = jnp.asarray(np.random.default_rng(10 + b).random((b, 3, 32, 32)),
                         jnp.float32)
        want = np.asarray(model.apply(params, hexify_batch(xb)))
        np.testing.assert_allclose(np.asarray(fn(xb)), want,
                                   rtol=1e-5, atol=1e-5)


def test_symbolic_batch_requires_shared_leading_dim():
    with pytest.raises(ValueError, match="shared leading dim"):
        export_fn(lambda a, b: a, (jnp.zeros((2, 3)), jnp.zeros((4, 3))),
                  symbolic_batch=True)
