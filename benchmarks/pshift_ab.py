"""A/B the periodic-shift hybrid on the >VMEM 4K resample (round 5).

VERDICT r4 item 2: the 4K hex->rect tier ran at ~52 GB/s (1.94 ms for
~100 MB of in+out traffic).  This script times the 4K configs under each
executor IN ONE PROCESS (HYGRID_RESAMPLE_IMPL is read at trace time, so
flipping the env between distinctly-jitted closures pins each tier), plus
a device correctness gate vs the XLA gather, and a bandwidth roofline
line per result.

    python benchmarks/pshift_ab.py            # all three executors
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from suite import _timeit  # noqa: E402


def mk_4k_plan():
    from hygrid_tpu.ops import sampling, geometry
    from hygrid_tpu import lattice
    h, w = 2160, 3840
    gx, gy = geometry._linspace_grid(
        lattice.corner_box("hex_to_rect", h, w), h, w)
    return sampling.hex_sample_plan(gx, gy, h, w, "linear")


def run(impl: str, plan, x, n=24):
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.kernels.resample_pallas import apply_plan_pallas
    os.environ["HYGRID_RESAMPLE_IMPL"] = impl

    def f(v):
        return apply_plan_pallas(v, plan)

    # correctness gate on-device (small slice: full 4K fetch through the
    # tunnel is slow; the executor choice is shape-independent here)
    a = np.asarray(jax.jit(f)(x)[:, :64, :256], np.float32)
    b = np.asarray(jax.jit(lambda v: sampling.apply_plan(v, plan))(x)
                   [:, :64, :256], np.float32)
    err = float(np.abs(a - b).max())
    per = _timeit(f, x, n=n)
    hbm = (2 * x.nbytes)  # src read + out write, bf16 both sides
    print(json.dumps({
        "config": "4K->4K hex->rect linear (3ch bf16)", "impl": impl,
        "ms": round(per * 1e3, 3), "max_err_vs_gather": err,
        "gb_s_at_min_traffic": round(hbm / per / 1e9, 1),
        "mpix_s": round(2160 * 3840 / per / 1e6, 1)}))
    os.environ.pop("HYGRID_RESAMPLE_IMPL", None)
    return per


def main():
    plan = mk_4k_plan()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 2160, 3840)), jnp.bfloat16)
    impls = sys.argv[1:] or ["pshift", "periodic", "auto"]
    for impl in impls:
        run(impl, plan, x)


if __name__ == "__main__":
    main()
