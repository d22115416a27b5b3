"""A/B the HexViT stem3 anomaly (round-5 profile: 96->192 @32x32 s2 runs
0.559 ms — 6.3x stem2 (48->96 @64x64) at identical FLOPs).  At 32x32 the
width is a quarter of a lane vector and C is wide — the per-impl tradeoff
measured at image scale (PERF.md "Per-impl single-op conv routing") may
flip.  Also times the s=2 conv as slice-then-conv (stride-1 'same' conv on
the pre-strided input is NOT equivalent; instead: full s=1 conv then
subsample rows/cols — equivalent output for this stem's geometry? NO in
general — kept to measure the upper bound only if bit-equal).

    python benchmarks/stem3_ab.py
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
from hygrid_tpu.nn import functional as F

B = 32
DT = jnp.bfloat16

SHAPES = [
    ("stem3 96->192 @32x32 s2", 96, 192, 32, 32),
    ("stem2 48->96 @64x64 s2", 48, 96, 64, 64),
]


def main():
    rng = np.random.default_rng(0)
    for (name, c, co, h, w) in SHAPES:
        x = jnp.asarray(rng.random((B, c, h, w)), DT)
        k = jnp.asarray(rng.random((co, c, 7)) * 0.1, DT)
        row = {"cell": name}
        ref = None
        for impl in ("direct", "mxu", "type1", "packed"):
            fn = jax.jit(lambda v, impl=impl: F.hex_conv2d(
                v, k, even_odd_offset=0, radius=2, stride=2, padding=1,
                impl=impl))
            try:
                out = np.asarray(fn(x), np.float32)
                if ref is None:
                    ref = out
                else:
                    rel = float(np.abs(out - ref).max()
                                / max(1e-6, np.abs(ref).max()))
                    row[impl + "_rel_err"] = round(rel, 5)
                row[impl + "_ms"] = round(_timeit(fn, x, n=24) * 1e3, 4)
            except Exception as e:
                row[impl + "_err"] = str(e)[:120]
        print(json.dumps(row), flush=True)

    # NHWC layout probe: does the s2 direct conv at tiny spatial benefit
    # from channels-last (lane dim = C instead of W)?
    c, co, h, w = 96, 192, 32, 32
    x = jnp.asarray(rng.random((B, c, h, w)), DT)
    k = jnp.asarray(rng.random((co, c, 7)) * 0.1, DT)
    fn_nchw = jax.jit(lambda v: F.hex_conv2d(
        v, k, even_odd_offset=0, radius=2, stride=2, padding=1,
        impl="direct"))
    t_nchw = _timeit(fn_nchw, x, n=24)
    print(json.dumps({"probe": "direct NCHW baseline",
                      "ms": round(t_nchw * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
