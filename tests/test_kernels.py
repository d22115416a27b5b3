"""Tests for the alternative conv implementations and Pallas kernels
(interpret mode on CPU; the same code compiles via Mosaic on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hygrid_tpu.nn import functional as F
from hygrid_tpu.kernels.conv_pallas import (
    hex_conv_stack_pallas, packed_hex_conv_pallas, pallas_conv_applicable)


CONFIGS = [
    # (C, Co, radius, padding, dilation, offset, h, w)
    (16, 16, 2, 1, 1, 0, 16, 16),
    (16, 16, 2, 1, 1, 1, 15, 13),
    (16, 8, 2, 0, 1, 0, 14, 20),
    (32, 32, 3, 2, 1, 0, 17, 19),
    (16, 16, 2, 2, 2, 0, 20, 16),
    (64, 64, 1, 0, 1, 1, 12, 12),
    (8, 128, 2, 1, 1, 0, 12, 12),
    (128, 128, 2, 1, 1, 0, 12, 10),   # q=1 degenerate packing (dense taps)
]


def _run(impl, cfg):
    C, Co, r, p, d, off, h, w = cfg
    rng = np.random.default_rng(hash(cfg) % 2**32)
    x = rng.random((2, C, h, w)).astype(np.float32)
    k = (rng.random((Co, C, F.hex_kernel_num(r))) - 0.5).astype(np.float32)
    b = rng.random(Co).astype(np.float32)
    return np.asarray(F.hex_conv2d(
        x, k, b, even_odd_offset=off, radius=r, padding=p, dilation=d,
        impl=impl))


@pytest.mark.parametrize("impl", ["mxu", "packed", "pallas", "auto"])
@pytest.mark.parametrize("cfg", CONFIGS)
def test_impls_agree_with_direct(impl, cfg):
    want = _run("direct", cfg)
    got = _run(impl, cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("C,r,L,h,w,bias_on", [
    (16, 2, 3, 16, 16, True),
    (16, 2, 3, 18, 13, False),
    (32, 3, 2, 12, 10, True),
    (16, 1, 2, 8, 8, True),
    (16, 2, 4, 20, 11, True),
    (128, 2, 2, 12, 10, True),        # q=1 degenerate packing
])
def test_pallas_stack_matches_chained(C, r, L, h, w, bias_on):
    rng = np.random.default_rng(C * 100 + L)
    x = rng.random((2, C, h, w)).astype(np.float32)
    ks = [(rng.random((C, C, F.hex_kernel_num(r))) - 0.5).astype(np.float32)
          for _ in range(L)]
    bs = ([rng.random(C).astype(np.float32) for _ in range(L)]
          if bias_on else None)
    ref = jnp.asarray(x)
    for i, k in enumerate(ks):
        b = bs[i] if bias_on else None
        ref = jax.nn.relu(F.hex_conv2d(
            ref, k, b, even_odd_offset=0, radius=r, padding=r - 1,
            impl="direct"))
    got = hex_conv_stack_pallas(x, ks, bs, radius=r)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_pallas_stack_no_final_activation():
    rng = np.random.default_rng(0)
    x = rng.random((1, 16, 8, 8)).astype(np.float32)
    ks = [(rng.random((16, 16, 7)) - 0.5).astype(np.float32)]
    ref = F.hex_conv2d(x, ks[0], even_odd_offset=0, radius=2, padding=1,
                       impl="direct")
    got = hex_conv_stack_pallas(x, ks, None, radius=2, final_activation=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert float(np.asarray(got).min()) < 0  # no ReLU applied


def test_pallas_stack_nhwc_matches_nchw():
    """data_format="NHWC" (pack = pure reshape, no moveaxis relayout —
    PERF.md fixed-cost decomposition) must match the NCHW entry under a
    transpose, forward AND grad, with fused GroupNorm."""
    rng = np.random.default_rng(3)
    x = rng.random((2, 16, 12, 20)).astype(np.float32)
    ks = [(rng.random((16, 16, 7)) - 0.5).astype(np.float32)
          for _ in range(2)]
    gn = [("gn", 4, np.ones(16, np.float32), np.zeros(16, np.float32))
          for _ in ks]
    a = hex_conv_stack_pallas(jnp.asarray(x), ks, None, radius=2, norms=gn)
    bt = hex_conv_stack_pallas(jnp.asarray(np.moveaxis(x, 1, -1)), ks,
                               None, radius=2, norms=gn,
                               data_format="NHWC")
    assert bt.shape == (2, 12, 20, 16)
    np.testing.assert_allclose(np.asarray(a),
                               np.moveaxis(np.asarray(bt), -1, 1),
                               atol=1e-5)
    ga = jax.grad(lambda v: jnp.sum(hex_conv_stack_pallas(
        v, ks, None, radius=2, norms=gn) ** 2))(jnp.asarray(x))
    gb = jax.grad(lambda v: jnp.sum(hex_conv_stack_pallas(
        v, ks, None, radius=2, norms=gn, data_format="NHWC") ** 2))(
        jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.asarray(ga),
                               np.moveaxis(np.asarray(gb), -1, 1),
                               atol=1e-4)


def test_pallas_stack_guards():
    with pytest.raises(ValueError):
        hex_conv_stack_pallas(np.ones((1, 16, 9, 8)), [np.ones((16, 16, 7))],
                              radius=2)  # odd height
    with pytest.raises(ValueError):
        hex_conv_stack_pallas(np.ones((1, 5, 8, 8)), [np.ones((5, 5, 7))],
                              radius=2)  # 128 % 5 != 0
    with pytest.raises(ValueError):
        hex_conv_stack_pallas(np.ones((1, 16, 8, 8)), [np.ones((16, 16, 7))],
                              radius=2, even_odd_offset=1)


def test_applicability_predicate():
    assert pallas_conv_applicable(16, 16, 1, 1)
    assert not pallas_conv_applicable(16, 16, 2, 1)   # stride
    assert not pallas_conv_applicable(16, 16, 1, 2)   # groups
    assert not pallas_conv_applicable(5, 16, 1, 1)    # 128 % 5
    # the round-3 >2^24 size fence is lifted (VERDICT r3 item 6): big
    # inputs take the row-banded grid instead of falling back to XLA
    assert pallas_conv_applicable(16, 16, 1, 1, n_elements=2 ** 24 + 1)


def test_pallas_impl_large_input_rides_banded_kernel():
    """impl='pallas' on a former fence-out size must now stay on the
    Pallas path (the banded grid), not silently degrade to XLA
    (VERDICT r3 item 6 / weak #5)."""
    x = jax.ShapeDtypeStruct((32, 32, 256, 256), jnp.bfloat16)   # 2^26 elems
    k = jax.ShapeDtypeStruct((32, 32, 7), jnp.bfloat16)

    def f(v, kk):
        return F.hex_conv2d(v, kk, even_odd_offset=0, radius=2, padding=1,
                            impl="pallas")

    jaxpr = jax.make_jaxpr(f)(x, k)
    assert "pallas_call" in str(jaxpr)
    # and a small input still takes the full-plane pallas kernel
    xs = jax.ShapeDtypeStruct((1, 32, 64, 64), jnp.bfloat16)
    jaxpr_small = jax.make_jaxpr(f)(xs, k)
    assert "pallas_call" in str(jaxpr_small)


@pytest.mark.parametrize("c,co,shape,offset", [
    (16, 24, (2, 31, 40), 0),
    (32, 32, (3, 34, 33), 1),
    (128, 64, (1, 36, 40), 0),
])
def test_banded_single_op_conv_matches_full(c, co, shape, offset):
    """The row-banded single-op kernel (band_rows=) must equal the
    full-plane kernel and the direct XLA path, including at band sizes
    that don't divide the output rows."""
    from hygrid_tpu.kernels.conv_pallas import packed_hex_conv_pallas
    rng = np.random.default_rng(c + co)
    b, h, w = shape
    x = jnp.asarray(rng.random((b, c, h, w)), jnp.float32)
    k = jnp.asarray(rng.random((co, c, 7)) * 0.2, jnp.float32)
    want = np.asarray(F.hex_conv2d(x, k, even_odd_offset=offset, radius=2,
                                   padding=1, impl="direct"))
    for tr in (4, 8, 16):
        got = np.asarray(packed_hex_conv_pallas(
            x, k, even_odd_offset=offset, radius=2, padding=1,
            band_rows=tr))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_grad_flows():
    """The packed/pallas paths are linear-in-kernel matmul assemblies, so
    autodiff must work through them (training on TPU uses them)."""
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 8, 8)), jnp.float32)
    k = jnp.asarray(np.random.default_rng(2).random((16, 16, 7)), jnp.float32)

    def loss(kk):
        return jnp.sum(F.hex_conv2d(x, kk, even_odd_offset=0, radius=2,
                                    padding=1, impl="packed") ** 2)

    g = jax.grad(loss)(k)
    assert g.shape == k.shape and bool(jnp.any(g != 0))
    # finite-difference check on one coordinate
    eps = 1e-3
    e = jnp.zeros_like(k).at[3, 5, 2].set(eps)
    fd = (loss(k + e) - loss(k - e)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(g[3, 5, 2]), rtol=2e-2)


@pytest.mark.parametrize("C,r,L,h,w,bias_on", [
    (16, 2, 3, 16, 16, True),
    (16, 2, 4, 18, 13, False),
    (32, 3, 2, 12, 10, True),
])
def test_fused_stack_matches_per_layer(C, r, L, h, w, bias_on):
    rng = np.random.default_rng(C + L)
    x = rng.random((2, C, h, w)).astype(np.float32)
    ks = [(rng.random((C, C, F.hex_kernel_num(r))) - 0.5).astype(np.float32)
          for _ in range(L)]
    bs = ([rng.random(C).astype(np.float32) for _ in range(L)]
          if bias_on else None)
    a = np.asarray(hex_conv_stack_pallas(x, ks, bs, radius=r))
    f = np.asarray(hex_conv_stack_pallas(x, ks, bs, radius=r, fused=True))
    np.testing.assert_allclose(a, f, atol=1e-5)


@pytest.mark.parametrize("kind,method,src,out", [
    ("rect", "bilinear", (64, 64), (32, 32)),
    ("rect", "nearest", (64, 64), (32, 32)),
    ("hex", "linear", (40, 56), (80, 112)),
    ("hex", "nearest", (40, 56), (80, 112)),
])
def test_banded_resample_matches_xla(kind, method, src, out):
    """The >VMEM banded kernel (double-buffered row-band DMA from HBM,
    VERDICT r1 missing #2) forced on small shapes must match the XLA
    gather path; covers all four plan families."""
    from hygrid_tpu.ops import sampling, geometry
    from hygrid_tpu import lattice
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    sh, sw = src
    oh, ow = out
    box = "rect_source" if kind == "rect" else "hex_to_rect"
    gx, gy = geometry._linspace_grid(lattice.corner_box(box, sh, sw), oh, ow)
    plan = (sampling.rect_sample_plan(gx, gy, sh, sw, method)
            if kind == "rect"
            else sampling.hex_sample_plan(gx, gy, sh, sw, method))
    rng = np.random.default_rng(oh)
    x = rng.random((3, sh, sw)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan, force_banded=True))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_banded_resample_grad():
    from hygrid_tpu.ops import sampling, geometry
    from hygrid_tpu import lattice
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 32, 32)), jnp.float32)
    plan = sampling.rect_sample_plan(
        *geometry._linspace_grid(lattice.corner_box("rect_source", 32, 32),
                                 16, 16), 32, 32, "bilinear")
    g1 = jax.grad(lambda v: apply_plan_pallas(
        v, plan, force_banded=True).sum())(img)
    g2 = jax.grad(lambda v: sampling.apply_plan(v, plan).sum())(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_banded_applicability_large_source():
    """A 4K f32 source plane (33 MB) exceeds the VMEM budget but must stay
    on the Pallas path via banding."""
    from hygrid_tpu.ops import sampling, geometry
    from hygrid_tpu import lattice
    from hygrid_tpu.kernels.resample_pallas import pallas_resample_applicable
    gx, gy = geometry._linspace_grid(
        lattice.corner_box("hex_to_rect", 2160, 3840), 2160, 3840)
    plan = sampling.hex_sample_plan(gx, gy, 2160, 3840, "linear")
    assert pallas_resample_applicable(plan, 3, 4)


def test_pallas_resample_grad_matches_xla():
    """apply_plan_pallas carries a custom VJP (transpose scatter); TPU
    training through resamples depends on it."""
    from hygrid_tpu.ops import sampling, geometry
    from hygrid_tpu import lattice
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, 16, 14)), jnp.float32)
    plan = sampling.hex_sample_plan(
        *geometry._linspace_grid(lattice.corner_box("hexresize", 16, 14),
                                 23, 19), 16, 14, "linear")
    g1 = jax.grad(lambda x: jnp.sum(sampling.apply_plan(x, plan) ** 2))(img)
    g2 = jax.grad(lambda x: jnp.sum(apply_plan_pallas(x, plan) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


# ---------------- phase-cached resample mode (round 2) ----------------

def _mk_plan(kind, method, src, out):
    from hygrid_tpu.ops import sampling, geometry
    from hygrid_tpu import lattice
    sh, sw = src
    oh, ow = out
    box = "rect_source" if kind == "rect" else "hex_to_rect"
    gx, gy = geometry._linspace_grid(lattice.corner_box(box, sh, sw), oh, ow)
    return (sampling.rect_sample_plan(gx, gy, sh, sw, method)
            if kind == "rect"
            else sampling.hex_sample_plan(gx, gy, sh, sw, method))


def test_phase_dedup_periodic_same_size():
    """Same-size hex->rect plans repeat their (columns, weights) row
    pattern every few rows — the launch geometry must detect this (the 4K
    bench case has 3 phases out of 2160 rows) and the phase-cached kernel
    must match the XLA gather bit-for-bit at f32."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import (_launch_geometry,
                                                    apply_plan_pallas)
    plan = _mk_plan("hex", "linear", (96, 128), (96, 128))
    g = _launch_geometry(plan, 3, 4)
    assert g.phase_mode and g.n_phases <= 4
    rng = np.random.default_rng(0)
    x = rng.random((3, 96, 128)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("force_banded", [False, True])
def test_phase_mode_matches_xla(force_banded):
    """Plans with few distinct row patterns ride the phase-cached kernel
    (selection matrices built once per column tile into VMEM scratch);
    both the full-source and banded variants must match XLA."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import (_launch_geometry,
                                                    apply_plan_pallas)
    plan = _mk_plan("rect", "bilinear", (64, 64), (32, 32))
    g = _launch_geometry(plan, 6, 4, force_banded=force_banded)
    assert g.phase_mode
    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 64, 64)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan, force_banded=force_banded))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_legacy_mode_still_selected_and_matches():
    """Plans with too many distinct row patterns keep the per-row one-hot
    build (legacy kernels)."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import (_launch_geometry,
                                                    apply_plan_pallas)
    plan = _mk_plan("hex", "linear", (64, 128), (128, 256))
    g = _launch_geometry(plan, 3, 4)
    assert not g.phase_mode and g.n_phases > 64
    rng = np.random.default_rng(2)
    x = rng.random((3, 64, 128)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_exact_select_single_dslot():
    """Exact-select (mosaic/nearest) plans whose terms all sit on one band
    row must drop the dead row-part: half the one-hot builds and matmuls."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import (_launch_geometry,
                                                    apply_plan_pallas)
    # one source row per output row, none touching the last source row:
    # every term sits at band delta 0
    h, w, oh = 16, 48, 32
    rows = (np.arange(oh) % 8)[:, None] * w
    cols = ((np.arange(w)[None, :] * 7) % w)
    flat = np.broadcast_to(rows + cols, (oh, w)).astype(np.int32)
    mask = np.ones((oh, w), np.float32)
    plan = sampling.SamplePlan(flat[None], mask[None], (h, w),
                               (oh, w), exact_select=True)
    g = _launch_geometry(plan, 3, 4)
    assert g.d_slots == (0,)
    rng = np.random.default_rng(3)
    x = rng.random((3, h, w)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=0)


def test_phase_grad_matches_xla():
    """The custom VJP is mode-independent; cover it through a phased plan."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    plan = _mk_plan("rect", "bilinear", (32, 32), (16, 16))
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 32, 32)), jnp.float32)
    g1 = jax.grad(lambda v: jnp.sum(apply_plan_pallas(v, plan) ** 2))(img)
    g2 = jax.grad(lambda v: jnp.sum(sampling.apply_plan(v, plan) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_kernel_cost_reports_launch_geometry():
    """Roofline accounting (PERF.md utilisation table) must derive from the
    same LaunchGeometry the launcher uses."""
    from hygrid_tpu.kernels.resample_pallas import kernel_cost
    plan = _mk_plan("rect", "bilinear", (64, 64), (32, 32))
    c = kernel_cost(plan, (2, 3), jnp.float32)
    assert c["mxu_flops"] > 0 and c["hbm_bytes"] > 0
    assert c["useful_flops"] == 2 * int((plan.weights != 0).sum()) * 6
    g = c["geometry"]
    assert g.phase_mode
    # phased VPU cost counts builds once per (group, column tile)
    assert c["vpu_elems"] == (g.n_groups * g.n_ctiles * g.n_phases
                              * len(g.d_slots) * g.k * g.cb * g.cw)


@pytest.mark.parametrize("method,tol", [("linear", 0.0), ("nearest", 0.0)])
def test_periodic_path_selected_and_exact(method, tol):
    """Integer-ratio plans (same-size hex->rect: the 4K bench config) have
    an exactly periodic row structure and must ride the pure-XLA
    large-matmul path — P*n_d*n_ctiles matmuls, no per-row work — with
    bit-exact f32 parity vs the XLA gather (boundary rows fall back to the
    gather inside the same call)."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import (
        _launch_geometry, periodic_decompose, apply_plan_pallas)
    import os
    plan = _mk_plan("hex", method, (96, 128), (96, 128))
    g = _launch_geometry(plan, 6, 4)
    per = periodic_decompose(g, 96)
    assert per is not None and per[0] <= 2
    rng = np.random.default_rng(5)
    x = rng.random((2, 3, 96, 128)).astype(np.float32)
    # pin the periodic tier: `auto` routes same-size plans to the shift
    # executor (round 4), whose sequential-FMA sum order is ~1e-7, not
    # bit-exact — this test's contract is the periodic tier's parity
    os.environ["HYGRID_RESAMPLE_IMPL"] = "periodic"
    try:
        a = np.asarray(apply_plan_pallas(x, plan))
    finally:
        os.environ.pop("HYGRID_RESAMPLE_IMPL", None)
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=tol)


def test_periodic_grad_matches_xla():
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    plan = _mk_plan("hex", "linear", (48, 64), (48, 64))
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((2, 48, 64)), jnp.float32)
    g1 = jax.grad(lambda v: jnp.sum(apply_plan_pallas(v, plan) ** 2))(img)
    g2 = jax.grad(lambda v: jnp.sum(sampling.apply_plan(v, plan) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_periodic_col_banded_matches_xla():
    """Wide periodic plans engage column banding; the host-built selection
    matrices must ignore zero-weight placeholder slots whose rebased
    columns fall outside the band (negative after rebase)."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import (
        _launch_geometry, periodic_decompose, apply_plan_pallas)
    plan = _mk_plan("hex", "linear", (64, 2560), (64, 2560))
    g = _launch_geometry(plan, 6, 4)
    assert g.col_banded and periodic_decompose(g, 64) is not None
    rng = np.random.default_rng(7)
    x = rng.random((2, 3, 64, 2560)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_stack_custom_vjp_matches_direct_grads():
    """hex_conv_stack_pallas is differentiable via its custom VJP (pallas
    cannot differentiate through input_output_aliases; the pullback rides
    the equivalent XLA packed chain).  Grads w.r.t. input, kernels AND
    biases must match the chained direct path."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (16, 16, 7)), jnp.float32)
          for _ in range(3)]
    bs = [jnp.asarray(rng.normal(size=(16,)), jnp.float32), None,
          jnp.asarray(rng.normal(size=(16,)), jnp.float32)]

    def loss_stack(x, ks, bs):
        return jnp.sum(hex_conv_stack_pallas(x, ks, bs, radius=2) ** 2)

    def loss_ref(x, ks, bs):
        h = x
        for k, b_ in zip(ks, bs):
            h = jax.nn.relu(F.hex_conv2d(h, k, b_, even_odd_offset=0,
                                         radius=2, padding=1))
        return jnp.sum(h ** 2)

    g1 = jax.jit(jax.grad(loss_stack, argnums=(0, 1, 2)))(x, ks, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ks, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_periodic_cache_keyed_by_dtype():
    """A bf16 apply must not poison the periodic selection-matrix cache for
    a later f32 apply of the SAME plan object (geometry._cached_plan reuses
    one plan across dtypes): f32 keeps bit-parity with apply_plan."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu import lattice
    from hygrid_tpu.ops.geometry import _linspace_grid
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    gx, gy = _linspace_grid(lattice.corner_box("hex_to_rect", 40, 40), 56, 56)
    plan = sampling.hex_sample_plan(gx, gy, 40, 40, "linear")
    rng = np.random.default_rng(5)
    x32 = jnp.asarray(rng.random((3, 40, 40)), jnp.float32)
    # poison attempt: bf16 first
    _ = apply_plan_pallas(x32.astype(jnp.bfloat16), plan)
    got = apply_plan_pallas(x32, plan)
    want = sampling.apply_plan(x32, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_pipeline_default_microbatches():
    """Default microbatch selection: any divisor of B >= S works (B=6,S=4
    must not raise), and B=128,S=4 must not degrade to batch-1
    microbatches."""
    import hygrid_tpu.parallel as parallel
    from hygrid_tpu.parallel import pipeline_hex_conv_stack
    mesh = parallel.create_mesh({"pp": 4})
    rng = np.random.default_rng(2)
    ks = jnp.asarray(rng.normal(0, 0.2, (4, 16, 16, 7)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(6, 16, 8, 8)), jnp.float32)
    y = pipeline_hex_conv_stack(x, ks, mesh, radius=2)   # B=6: M=6 works
    ref = x
    for i in range(4):
        ref = F.hex_conv2d(ref, ks[i], even_odd_offset=0, radius=2,
                           padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


# ------------------------- fused norm (GN / affine) -------------------------

def _gn_chain(x, ks, gammas, betas, G, r, bs=None, final_act=True):
    from hygrid_tpu.kernels.conv_pallas import _group_norm_nchw
    h = jnp.asarray(x)
    L = len(ks)
    for i, k in enumerate(ks):
        b_ = bs[i] if bs is not None else None
        h = F.hex_conv2d(h, k, b_, even_odd_offset=0, radius=r,
                         padding=r - 1, impl="direct")
        h = _group_norm_nchw(h, G, gammas[i], betas[i])
        if final_act or i < L - 1:
            h = jnp.maximum(h, 0)
    return h


@pytest.mark.parametrize("C,G,r,L,h,w", [
    (16, 8, 2, 3, 16, 13),
    (32, 4, 2, 2, 12, 12),
    (16, 2, 1, 2, 8, 9),
    (64, 8, 2, 2, 10, 16),
])
def test_pallas_stack_gn_matches_chained(C, G, r, L, h, w):
    """Fused in-kernel GroupNorm (stats per sample over masked interior)
    equals conv -> GN -> ReLU chained per-op (VERDICT r2 item 1: the model
    layer's conv/GN/ReLU stages must ride the packed stack)."""
    rng = np.random.default_rng(C + G + L)
    x = rng.random((2, C, h, w)).astype(np.float32)
    ks = [(rng.random((C, C, F.hex_kernel_num(r))) - 0.5).astype(np.float32)
          for _ in range(L)]
    gammas = [(1 + 0.2 * rng.random(C)).astype(np.float32) for _ in range(L)]
    betas = [(0.2 * rng.random(C)).astype(np.float32) for _ in range(L)]
    norms = [("gn", G, g, b) for g, b in zip(gammas, betas)]
    want = _gn_chain(x, ks, gammas, betas, G, r)
    got = hex_conv_stack_pallas(x, ks, None, radius=r, norms=norms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_pallas_stack_gn_grads():
    """Grads through the GN stack (custom VJP -> XLA twin with GN) match
    the chained per-op path for input, kernels and affine params."""
    rng = np.random.default_rng(3)
    C, G, r, L = 16, 8, 2, 2
    x = jnp.asarray(rng.normal(size=(2, C, 12, 11)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (C, C, 7)), jnp.float32)
          for _ in range(L)]
    gammas = [jnp.asarray(1 + 0.2 * rng.random(C), jnp.float32)
              for _ in range(L)]
    betas = [jnp.asarray(0.2 * rng.random(C), jnp.float32) for _ in range(L)]

    def loss_stack(x, ks, gs, bs):
        norms = [("gn", G, g, b) for g, b in zip(gs, bs)]
        return jnp.sum(
            hex_conv_stack_pallas(x, ks, None, radius=r, norms=norms) ** 2)

    def loss_ref(x, ks, gs, bs):
        return jnp.sum(_gn_chain(x, ks, gs, bs, G, r) ** 2)

    g1 = jax.jit(jax.grad(loss_stack, argnums=(0, 1, 2, 3)))(
        x, ks, gammas, betas)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, ks, gammas, betas)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_pallas_stack_affine_norm():
    """("affine", scale, shift) entries fold inference BatchNorm into the
    layer kernel."""
    rng = np.random.default_rng(9)
    C, r = 16, 2
    x = rng.random((1, C, 8, 8)).astype(np.float32)
    k = (rng.random((C, C, 7)) - 0.5).astype(np.float32)
    scale = (1 + rng.random(C)).astype(np.float32)
    shift = rng.random(C).astype(np.float32)
    want = F.hex_conv2d(x, k, even_odd_offset=0, radius=r, padding=1,
                        impl="direct")
    want = jnp.maximum(want * scale[None, :, None, None]
                       + shift[None, :, None, None], 0)
    got = hex_conv_stack_pallas(x, [k], None, radius=r,
                                norms=[("affine", scale, shift)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_stack_norms_guards():
    x = np.ones((1, 16, 8, 8), np.float32)
    ks = [np.ones((16, 16, 7), np.float32)] * 2
    with pytest.raises(ValueError):  # wrong length
        hex_conv_stack_pallas(x, ks, radius=2,
                              norms=[("affine", np.ones(16), np.zeros(16))])
    with pytest.raises(ValueError):  # groups don't divide channels
        hex_conv_stack_pallas(x, ks[:1], radius=2,
                              norms=[("gn", 5, np.ones(16), np.zeros(16))])
    with pytest.raises(ValueError):  # fused + norms unsupported
        hex_conv_stack_pallas(
            x, ks, radius=2, fused=True,
            norms=[("affine", np.ones(16), np.zeros(16))] * 2)


def test_hex_bilinear_plan_rides_pallas():
    """Hex-source 'bilinear' (method 2, new in r3) produces row-separable
    plans that ride the fused resample kernel like the other modes."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.ops.geometry import _linspace_grid
    from hygrid_tpu import lattice
    from hygrid_tpu.kernels.resample_pallas import (
        pallas_resample_applicable, apply_plan_pallas)
    gx, gy = _linspace_grid(lattice.corner_box("hexresize", 32, 32), 48, 40)
    plan = sampling.hex_sample_plan(gx, gy, 32, 32, "bilinear")
    assert pallas_resample_applicable(plan, 3, 4)
    x = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)
    a = np.asarray(apply_plan_pallas(x, plan))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("C,r,L,h,w,bg,brr,bias_on", [
    (16, 2, 3, 16, 16, 2, 4, True),
    (16, 2, 2, 18, 13, 3, 8, False),
    (32, 3, 2, 12, 10, 1, 4, True),
    (128, 2, 2, 12, 10, 1, 4, True),   # q=1 degenerate packing
])
def test_banded_stack_matches_chained(C, r, L, h, w, bg, brr, bias_on):
    """Row-banded stack layers (HBM-resident planes + double-buffered band
    DMA, VERDICT r2 item 2) equal the chained per-op path — including
    non-dividing band counts, masked slack rows and margin re-writes."""
    rng = np.random.default_rng(C * 7 + L)
    x = rng.random((6, C, h, w)).astype(np.float32)
    ks = [(rng.random((C, C, F.hex_kernel_num(r))) - 0.5).astype(np.float32)
          for _ in range(L)]
    bs = ([rng.random(C).astype(np.float32) for _ in range(L)]
          if bias_on else None)
    ref = jnp.asarray(x)
    for i, k in enumerate(ks):
        b_ = bs[i] if bias_on else None
        ref = jax.nn.relu(F.hex_conv2d(ref, k, b_, even_odd_offset=0,
                                       radius=r, padding=r - 1,
                                       impl="direct"))
    got = hex_conv_stack_pallas(x, ks, bs, radius=r, batch_group=bg,
                                band_rows=brr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_banded_stack_grads_and_guards():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 12)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (16, 16, 7)), jnp.float32)
          for _ in range(2)]

    def loss_banded(x, ks):
        return jnp.sum(hex_conv_stack_pallas(
            x, ks, None, radius=2, band_rows=4) ** 2)

    def loss_ref(x, ks):
        h = x
        for k in ks:
            h = jax.nn.relu(F.hex_conv2d(h, k, even_odd_offset=0, radius=2,
                                         padding=1))
        return jnp.sum(h ** 2)

    g1 = jax.grad(loss_banded, argnums=(0, 1))(x, ks)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, ks)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)
    with pytest.raises(ValueError):   # banded + norms: no global stats
        hex_conv_stack_pallas(
            np.ones((1, 16, 8, 8), np.float32), ks[:1], radius=2,
            band_rows=4,
            norms=[("gn", 8, np.ones(16), np.zeros(16))])


def test_stack_vmem_autoroute():
    """Stacks whose full-plane VMEM need exceeds the budget auto-route:
    norm-free uniform chains to the row-banded >VMEM tier, GN chains to
    the pure-XLA packed twin — both numerically equal to the per-op
    chain.  (Exercised by shrinking the budget; at real sizes this
    triggers only where the full-plane kernel cannot compile.)"""
    from unittest import mock
    from hygrid_tpu.kernels import conv_pallas as cp

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 16, 20, 18)), jnp.float32)
    ks = [jnp.asarray(rng.normal(0, 0.2, (16, 16, 7)), jnp.float32)
          for _ in range(2)]
    gn = [("gn", 8, jnp.ones(16), jnp.zeros(16))] * 2

    ref = hex_conv_stack_pallas(x, ks, None, radius=2)
    ref_gn = hex_conv_stack_pallas(x, ks, None, radius=2, norms=gn)

    calls = []
    orig = cp._stack_impl_banded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    with mock.patch.object(cp, "_STACK_VMEM_BUDGET", 1), \
            mock.patch.object(cp, "_stack_impl_banded", spy):
        got = hex_conv_stack_pallas(x, ks, None, radius=2)
        got_gn = hex_conv_stack_pallas(x, ks, None, radius=2, norms=gn)
    assert calls, "norm-free >VMEM stack did not take the banded tier"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gn), np.asarray(ref_gn),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Shift-structured executor (kernels/resample_shift.py)
# ---------------------------------------------------------------------------

def test_shift_decompose_detects_hot_plan_families():
    """Every resample-hot plan family has a constant-stride column mapping:
    same-size hex->rect (num=den=1), the north-star legs (num=den=1 -- only
    rows change), rect 2:1 downsample (num=2), and the mosaic's zoom
    upsample (den=zoom, exercised in test_shift_mosaic_exact below)."""
    from hygrid_tpu.kernels.resample_shift import shift_decompose_cached
    cases = [
        ("hex", "linear", (96, 128), (96, 128)),
        ("rect", "bilinear", (128, 128), (64, 128)),
        ("hex", "linear", (64, 128), (128, 128)),
        ("rect", "bilinear", (64, 64), (32, 32)),
        ("hex", "nearest", (96, 128), (96, 128)),
    ]
    for kind, method, src, out in cases:
        geo = shift_decompose_cached(_mk_plan(kind, method, src, out))
        assert geo is not None, (kind, method, src, out)
        assert len(geo.slots) <= 10


@pytest.mark.parametrize("kind,method,src,out,lead", [
    ("hex", "linear", (96, 128), (96, 128), (2, 3)),      # phase mode
    ("rect", "bilinear", (128, 128), (64, 128), (3,)),    # dense, bc=3 pad
    ("hex", "linear", (64, 128), (128, 128), (4, 3)),     # dense
    ("rect", "bilinear", (64, 64), (32, 32), (2, 3)),     # num=2 planes
])
@pytest.mark.parametrize("force_banded", [False, True])
def test_shift_executor_matches_xla(kind, method, src, out, lead,
                                    force_banded):
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_shift import (shift_decompose_cached,
                                                   apply_plan_shift)
    plan = _mk_plan(kind, method, src, out)
    assert shift_decompose_cached(plan) is not None
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.random(lead + src), jnp.float32)
    a = np.asarray(apply_plan_shift(x, plan, force_banded=force_banded))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_shift_executor_bf16_and_grad():
    """bf16 rides the same kernel (weights upcast in-kernel); the grad
    flows through apply_plan_pallas's custom VJP like every other tier."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    from hygrid_tpu.kernels.resample_shift import shift_decompose_cached
    plan = _mk_plan("hex", "linear", (48, 64), (48, 64))
    assert shift_decompose_cached(plan) is not None
    rng = np.random.default_rng(19)
    xb = jnp.asarray(rng.random((2, 48, 64)), jnp.bfloat16)
    a = np.asarray(apply_plan_pallas(xb, plan), np.float32)
    b = np.asarray(sampling.apply_plan(xb, plan), np.float32)
    np.testing.assert_allclose(a, b, atol=2e-2)
    xf = xb.astype(jnp.float32)
    g1 = jax.grad(lambda v: jnp.sum(apply_plan_pallas(v, plan) ** 2))(xf)
    g2 = jax.grad(lambda v: jnp.sum(sampling.apply_plan(v, plan) ** 2))(xf)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_shift_mosaic_exact():
    """The mosaic render plan (K=1 exact 0/1 select, den=zoom column
    upsample) must round-trip bit-exactly through the shift executor."""
    from hygrid_tpu.viz.render import mosaic_plan
    from hygrid_tpu.ops.sampling import SamplePlan, apply_plan
    from hygrid_tpu.kernels.resample_shift import (shift_decompose_cached,
                                                   apply_plan_shift)
    flat, mask = [np.asarray(v) for v in mosaic_plan(136, 240, 544, 960, 0)]
    plan = SamplePlan(flat[None], mask[None].astype(np.float32),
                      (136, 240), (544, 960), exact_select=True)
    geo = shift_decompose_cached(plan)
    assert geo is not None and geo.den == 4
    rng = np.random.default_rng(23)
    x = jnp.asarray((rng.random((3, 136, 240)) * 255), jnp.float32)
    a = np.asarray(apply_plan_shift(x, plan))
    b = np.asarray(apply_plan(x, plan))
    assert (a == b).all()


def test_shift_impl_env_pins_executor():
    """HYGRID_RESAMPLE_IMPL=onehot must bypass both the shift and periodic
    tiers (the A/B knob benchmarks/shift_ab.py relies on)."""
    import os as _os
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    plan = _mk_plan("hex", "linear", (48, 64), (48, 64))
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.random((2, 48, 64)), jnp.float32)
    b = np.asarray(sampling.apply_plan(x, plan))
    for impl in ("shift", "onehot"):
        _os.environ["HYGRID_RESAMPLE_IMPL"] = impl
        try:
            a = np.asarray(apply_plan_pallas(x, plan))
        finally:
            _os.environ.pop("HYGRID_RESAMPLE_IMPL", None)
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("kind,method,src,out,lead", [
    ("hex", "linear", (96, 128), (96, 128), (3,)),     # the 4K family
    ("hex", "nearest", (96, 128), (96, 128), (2, 3)),  # exact-select
    ("hex", "linear", (64, 256), (64, 256), (3,)),
])
def test_periodic_shift_hybrid_matches_xla(kind, method, src, out, lead):
    """The pure-XLA periodic-rows x shift-columns hybrid (round 5) must
    match the gather path bit-for-bit at f32 — it is the >VMEM tier for
    unit-stride periodic plans (the 4K hex->rect bench family)."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_shift import (
        shift_decompose_cached, apply_plan_periodic_shift)
    plan = _mk_plan(kind, method, src, out)
    geo = shift_decompose_cached(plan)
    assert geo is not None and geo.num == 1 and geo.den == 1
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.random(lead + src), jnp.float32)
    a = np.asarray(apply_plan_periodic_shift(x, plan, geo))
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_array_equal(a, b)
    # bf16: one output ulp (slot accumulation order vs the gather's plan
    # term order rounds differently once cast back to bf16)
    xb = x.astype(jnp.bfloat16)
    ab = np.asarray(apply_plan_periodic_shift(xb, plan, geo), np.float32)
    bb = np.asarray(sampling.apply_plan(xb, plan), np.float32)
    np.testing.assert_allclose(ab, bb, atol=8e-3)


def test_periodic_shift_hybrid_grad_and_env():
    """HYGRID_RESAMPLE_IMPL=pshift pins the hybrid through the dispatcher;
    the grad rides apply_plan_pallas's custom VJP like every tier."""
    import os as _os
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    plan = _mk_plan("hex", "linear", (48, 64), (48, 64))
    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.random((2, 48, 64)), jnp.float32)
    _os.environ["HYGRID_RESAMPLE_IMPL"] = "pshift"
    try:
        a = np.asarray(apply_plan_pallas(x, plan))
        g1 = jax.grad(lambda v: jnp.sum(apply_plan_pallas(v, plan) ** 2))(x)
    finally:
        _os.environ.pop("HYGRID_RESAMPLE_IMPL", None)
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_array_equal(a, b)
    g2 = jax.grad(lambda v: jnp.sum(sampling.apply_plan(v, plan) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_periodic_shift_hybrid_rejects_non_qualifying():
    """Strided-column (num>1/den>1) and aperiodic plans must raise — the
    dispatcher checks the same predicates before routing."""
    from hygrid_tpu.kernels.resample_shift import apply_plan_periodic_shift
    plan = _mk_plan("rect", "bilinear", (64, 64), (32, 32))   # num=2
    x = jnp.zeros((3, 64, 64), jnp.float32)
    with pytest.raises(ValueError):
        apply_plan_periodic_shift(x, plan)


def test_auto_routes_large_unit_stride_periodic_to_hybrid(monkeypatch):
    """>VMEM unit-stride periodic plans must auto-route to the
    periodic-shift hybrid (the measured 2x winner at 4K, PERF.md r5) —
    pin the dispatch so a routing regression is caught on CPU."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels import resample_pallas as rp
    from hygrid_tpu.kernels import resample_shift as rs
    calls = []
    real = rs.apply_plan_periodic_shift

    def spy(image, plan, geo=None, per=None):
        calls.append(plan.out_shape)
        return real(image, plan, geo, per)

    monkeypatch.setattr(rs, "apply_plan_periodic_shift", spy)
    # 1500x1500 f32 source = 9 MB > the 8 MB VMEM budget -> hybrid
    plan = _mk_plan("hex", "linear", (1500, 1500), (1500, 1500))
    x = jnp.zeros((1, 1500, 1500), jnp.float32)
    out = rp.apply_plan_pallas(x, plan)
    assert calls == [(1500, 1500)]
    assert out.shape == (1, 1500, 1500)
    # ...while a small same-size plan stays on the shift-full executor
    calls.clear()
    small = _mk_plan("hex", "linear", (96, 128), (96, 128))
    rp.apply_plan_pallas(jnp.zeros((1, 96, 128), jnp.float32), small)
    assert calls == []


def test_pshift_pin_degrades_on_aperiodic_plans():
    """HYGRID_RESAMPLE_IMPL=pshift on a unit-stride but row-APERIODIC
    plan must fall through to the MXU tiers like every other pin, not
    raise at trace time (found by review, round 5)."""
    import os as _os
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    # 100 -> 93-row same-width resize: unit column stride, aperiodic rows
    from hygrid_tpu.ops import geometry
    from hygrid_tpu import lattice
    gx, gy = geometry._linspace_grid(
        lattice.corner_box("hex_to_rect", 100, 128), 93, 128)
    plan = sampling.hex_sample_plan(gx, gy, 100, 128, "linear")
    x = jnp.asarray(np.random.default_rng(41).random((2, 100, 128)),
                    jnp.float32)
    _os.environ["HYGRID_RESAMPLE_IMPL"] = "pshift"
    try:
        a = np.asarray(apply_plan_pallas(x, plan))
    finally:
        _os.environ.pop("HYGRID_RESAMPLE_IMPL", None)
    b = np.asarray(sampling.apply_plan(x, plan))
    np.testing.assert_allclose(a, b, atol=1e-5)
