"""A/B the shift-FMA resample executor against the shipped MXU tiers.

Round-4 measurement harness for VERDICT r3 item 1: run the resample-hot
configs under each value of ``HYGRID_RESAMPLE_IMPL`` (trace-time env, so
one subprocess per impl) and report differential ms/iter per stage plus
the end-to-end configs that ride resampling (north star, video, mosaic).

Usage (one impl per process; the env must be set before any plan traces):

    python benchmarks/shift_ab.py shift  legs resample4k mosaic
    python benchmarks/shift_ab.py periodic legs resample4k mosaic
    python benchmarks/shift_ab.py onehot legs resample4k mosaic
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMPL = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["HYGRID_RESAMPLE_IMPL"] = IMPL

import numpy as np
import jax
import jax.numpy as jnp

from suite import _timeit  # noqa: E402  (after sys.path insert)


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


def check():
    """Device correctness gate: every hot plan family vs the XLA gather."""
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    cases = [
        ("rect512->256 bilinear", _mk_plan("rect", "bilinear", (128, 128), (64, 128)), (4, 3)),
        ("hex256->512 linear", _mk_plan("hex", "linear", (64, 128), (128, 128)), (4, 3)),
        ("hex same linear", _mk_plan("hex", "linear", (96, 128), (96, 128)), (2, 3)),
        ("hex same nearest", _mk_plan("hex", "nearest", (96, 128), (96, 128)), (2, 3)),
    ]
    rng = np.random.default_rng(0)
    for name, plan, lead in cases:
        x = jnp.asarray(rng.random(lead + plan.src_shape), jnp.float32)
        a = np.asarray(apply_plan_pallas(x, plan))
        b = np.asarray(sampling.apply_plan(x, plan))
        err = float(np.abs(a - b).max())
        print(json.dumps({"check": name, "impl": IMPL, "max_err": err}))
        assert err < 1e-5, (name, err)


def legs():
    """The north-star resample legs in isolation (bf16, lead (16, 3)).

    NOTE the actual bench.py legs hexify to (256, 256) — HALF-width hex
    storage — so rect->hex is a num=2 column downsample and hex->rect a
    den=2 upsample; the (256, 512) rows are the full-width variants kept
    for continuity with the earlier round-4 A/Bs."""
    from hygrid_tpu.ops import sampling
    for name, plan in [
        ("NS rect->hex 512^2->256^2 bilinear", _mk_plan("rect", "bilinear", (512, 512), (256, 256))),
        ("NS hex->rect 256^2->512^2 linear", _mk_plan("hex", "linear", (256, 256), (512, 512))),
        ("rect->hex 512->256 bilinear", _mk_plan("rect", "bilinear", (512, 512), (256, 512))),
        ("hex->rect 256->512 linear", _mk_plan("hex", "linear", (256, 512), (512, 512))),
    ]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((16, 3) + plan.src_shape), jnp.bfloat16)
        f = jax.jit(lambda v, p=plan: sampling.apply_plan_auto(v, p))
        per = _timeit(f, x, n=48)
        print(json.dumps({"stage": name, "impl": IMPL,
                          "ms": round(per * 1e3, 4)}))


def resample4k():
    import hygrid_tpu as hg
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 2160, 3840)), jnp.bfloat16)
    f = jax.jit(lambda v: hg.hex_to_rect_resample(v, (2160, 3840), "linear"))
    per = _timeit(f, x, n=24)
    print(json.dumps({"stage": "4K hex->rect linear", "impl": IMPL,
                      "ms": round(per * 1e3, 4),
                      "Mpix/s": round(2160 * 3840 / 1e6 / per, 1)}))


def mosaic():
    from hygrid_tpu.viz import render_mosaic
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 540, 960)) * 255, jnp.float32)
    f = jax.jit(lambda v: render_mosaic(v, (2160, 3840)))
    per = _timeit(f, img, n=20)
    print(json.dumps({"stage": "4K mosaic render", "impl": IMPL,
                      "ms": round(per * 1e3, 4),
                      "fps": round(1.0 / per, 1)}))


def video():
    from hygrid_tpu.models.video import make_frame_processor
    rng = np.random.default_rng(0)
    proc = make_frame_processor(720, 1280)
    frame = jnp.asarray(rng.random((3, 720, 1280)), jnp.float32)
    per = _timeit(proc, frame, n=32)
    print(json.dumps({"stage": "720p video frame", "impl": IMPL,
                      "ms": round(per * 1e3, 4), "fps": round(1.0 / per, 1)}))


def northstar():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "root_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


ALL = {"check": check, "legs": legs, "resample4k": resample4k,
       "mosaic": mosaic, "video": video, "northstar": northstar}

if __name__ == "__main__":
    names = sys.argv[2:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:  # keep the battery going; record the failure
            print(json.dumps({"stage": n, "impl": IMPL,
                              "error": f"{type(e).__name__}: {e}"[:400]}))
