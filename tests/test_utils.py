"""Tests for profiling and checkpoint utilities."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygrid_tpu.utils import (annotate, device_timer, benchmark,
                              save_checkpoint, restore_checkpoint)
from hygrid_tpu.models import hexcnn_tiny, create_train_state


def test_annotate_and_timer():
    @annotate("unit-test-op")
    def f(x):
        return x * 2

    with device_timer("double") as t:
        t.result = f(jnp.ones(8))
    assert t.elapsed >= 0
    ms = benchmark(f, jnp.ones(8), iters=3)
    assert ms >= 0


def test_checkpoint_roundtrip_npz(tmp_path):
    model = hexcnn_tiny(norm=None)
    x = jnp.ones((1, 3, 16, 16))
    state = create_train_state(model, jax.random.key(0), x)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state.params)
    restored = restore_checkpoint(path, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored params evaluate identically
    out1 = model.apply({"params": state.params}, x)
    out2 = model.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_checkpoint_roundtrip_orbax(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    model = hexcnn_tiny(norm=None)
    x = jnp.ones((1, 3, 16, 16))
    state = create_train_state(model, jax.random.key(1), x)
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path, state.params)
    restored = restore_checkpoint(path, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
