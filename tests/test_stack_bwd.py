"""Hand-written Pallas stack backward (round 3).

``hex_conv_stack_pallas``'s custom VJP runs dL/dx and dL/dW as combined
per-layer Pallas kernels (``conv_pallas._stack_bwd_pallas``) instead of
re-differentiating the pure-XLA packed twin.  These tests pin (a) that the
hand path is actually TAKEN for the model-layer configs (not a silent
fallback), and (b) that its grads match the XLA-twin pullback — which the
broader suite already validates against the chained per-op reference
(``test_kernels.py::test_stack_custom_vjp_matches_direct_grads`` etc.).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hygrid_tpu.kernels.conv_pallas as cp
from hygrid_tpu.kernels.conv_pallas import hex_conv_stack_pallas, pack_planes


@pytest.fixture
def count_path(monkeypatch):
    """Wrap _stack_bwd_pallas to record hand-path vs fallback decisions."""
    calls = {"hand": 0, "fallback": 0}
    orig = cp._stack_bwd_pallas

    def wrapped(statics, res, g):
        out = orig(statics, res, g)
        calls["hand" if out is not None else "fallback"] += 1
        return out

    monkeypatch.setattr(cp, "_stack_bwd_pallas", wrapped)
    return calls


def _ab(loss, args, calls, expect_hand=True, tol=2e-5):
    """grad(loss) under HYGRID_STACK_BWD=auto vs =xla; assert path + match."""
    argnums = tuple(range(len(args)))
    os.environ["HYGRID_STACK_BWD"] = "auto"
    try:
        g1 = jax.grad(loss, argnums=argnums)(*args)
        took_hand = calls["hand"] > 0
        os.environ["HYGRID_STACK_BWD"] = "xla"
        g2 = jax.grad(loss, argnums=argnums)(*args)
    finally:
        os.environ.pop("HYGRID_STACK_BWD", None)
    assert took_hand == expect_hand, calls
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(1e-8, float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) / denom < tol


def test_bwd_pallas_basic_tailcut_multigrid(count_path):
    """Bias + ReLU + ragged width (tail_cut), batch 4 at bg<=2 — at least
    two sequential grid steps, exercising the dM accumulation across the
    revisited weight-gradient block."""
    rng = np.random.default_rng(0)
    C, r = 16, 2
    x = jnp.asarray(rng.normal(size=(4, C, 12, 11)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)
          for _ in range(3)]
    bs = [jnp.asarray(rng.normal(size=(C,)), jnp.float32), None,
          jnp.asarray(rng.normal(size=(C,)), jnp.float32)]

    def loss(x, ks, bs):
        return jnp.sum(hex_conv_stack_pallas(x, ks, bs, radius=r) ** 2)

    _ab(loss, (x, ks, bs), count_path)


def test_bwd_pallas_groupnorm(count_path):
    """conv->GN->ReLU stages: the conv pullback rides the Pallas kernels,
    the GN/bias tail is differentiated as the masked post closure."""
    rng = np.random.default_rng(1)
    C, G, r = 16, 8, 2
    x = jnp.asarray(rng.normal(size=(2, C, 12, 11)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)
          for _ in range(2)]
    gammas = [jnp.asarray(1 + 0.2 * rng.random(C), jnp.float32)
              for _ in range(2)]
    betas = [jnp.asarray(0.2 * rng.random(C), jnp.float32) for _ in range(2)]

    def loss(x, ks, gs, bts):
        norms = [("gn", G, g, b) for g, b in zip(gs, bts)]
        return jnp.sum(
            hex_conv_stack_pallas(x, ks, None, radius=r, norms=norms) ** 2)

    _ab(loss, (x, ks, gammas, betas), count_path)


def test_bwd_pallas_packed_io(count_path):
    """packed_io planes-in/planes-out: cotangents enter as planes and the
    returned dx is the margined plane pair (margins zero)."""
    rng = np.random.default_rng(2)
    C, r, w = 16, 2, 11
    img = jnp.asarray(rng.normal(size=(2, 12, w, C)), jnp.float32)
    planes = pack_planes(img, radius=r, nhwc=True)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)
          for _ in range(2)]

    def loss(pe, po, ks):
        oe, oo = hex_conv_stack_pallas(
            (pe, po), ks, None, radius=r, packed_io=True, image_width=w,
            in_channels=C)
        return jnp.sum(oe ** 2) + jnp.sum(oo ** 2)

    _ab(loss, (planes[0], planes[1], ks), count_path)
    # dx margins must stay zero (packed-domain consumers rely on it)
    os.environ["HYGRID_STACK_BWD"] = "pallas"
    try:
        dpe = jax.grad(loss, argnums=0)(planes[0], planes[1], ks)
    finally:
        os.environ.pop("HYGRID_STACK_BWD", None)
    dpe = np.asarray(dpe)
    assert np.all(dpe[:, 0] == 0) and np.all(dpe[:, :, 0] == 0)


def test_bwd_pallas_split_extra_input(count_path):
    """Decoder skip-join (extra_input): layer 0 pulls back through BOTH
    kernel halves; the dM of each half uses its own input planes."""
    rng = np.random.default_rng(3)
    C, r = 16, 2
    x = jnp.asarray(rng.normal(size=(2, C, 12, 11)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(2, C, 12, 11)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, 2 * C, 7)), jnp.float32),
          jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)]

    def loss(x, x2, ks):
        return jnp.sum(
            hex_conv_stack_pallas(x, ks, None, radius=r,
                                  extra_input=x2) ** 2)

    _ab(loss, (x, x2, ks), count_path)


def test_bwd_pallas_fused_falls_back(count_path):
    """fused=True is outside the hand path's envelope — it must pull back
    through the XLA twin, not miscompile."""
    rng = np.random.default_rng(4)
    C, r = 16, 2
    x = jnp.asarray(rng.normal(size=(2, C, 8, 8)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)
          for _ in range(2)]

    def loss(x, ks):
        return jnp.sum(
            hex_conv_stack_pallas(x, ks, None, radius=r, fused=True) ** 2)

    _ab(loss, (x, ks), count_path, expect_hand=False)


def test_dilated_stack_same_semantics(count_path):
    """Dilated stacks are 'same' at padding d*(radius-1) (round-3 fix: the
    meta previously folded padding radius-1 regardless of dilation, so the
    Pallas forward disagreed with its own XLA twin and the backward
    crashed on a shape mismatch).  d=2 rides the Pallas path forward and
    backward; d=3's padding exceeds the plane margin and must fall back to
    the XLA chain, still correct and differentiable."""
    from hygrid_tpu.nn import functional as F
    rng = np.random.default_rng(6)
    C, r = 16, 2
    x = jnp.asarray(rng.normal(size=(2, C, 16, 16)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)
          for _ in range(2)]

    def chain(x, ks, d):
        h = x
        for k in ks:
            h = jax.nn.relu(F.hex_conv2d(h, k, None, even_odd_offset=0,
                                         radius=r, padding=d * (r - 1),
                                         dilation=d))
        return h

    for d in (2, 3):
        got = hex_conv_stack_pallas(x, ks, None, radius=r, dilation=d)
        want = chain(x, ks, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        g1 = jax.grad(lambda x, d=d: jnp.sum(hex_conv_stack_pallas(
            x, ks, None, radius=r, dilation=d) ** 2))(x)
        g2 = jax.grad(lambda x, d=d: jnp.sum(chain(x, ks, d) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)
    assert count_path["hand"] > 0       # d=2 took the hand path


def test_bwd_pallas_bf16_train_dtype(count_path):
    """bf16 planes (the training dtype): the hand path must engage and
    agree with the XLA twin within bf16 remat tolerance."""
    rng = np.random.default_rng(5)
    C, r = 16, 2
    x = jnp.asarray(rng.normal(size=(2, C, 12, 8)), jnp.bfloat16)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.bfloat16)
          for _ in range(2)]

    def loss(x, ks):
        return jnp.sum(
            hex_conv_stack_pallas(x, ks, None, radius=r).astype(
                jnp.float32) ** 2)

    _ab(loss, (x, ks), count_path, tol=0.05)
