"""Routing A/B for LARGE single-op stride-1 hex convs (round 5): above the
banding threshold (2^23 elements) the round-4 banded single-op Pallas
kernel beat the 'mxu' path at both band-check cells (C=32 256^2 b32:
6.46-6.58 vs 6.71-6.83 ms; C=64 128^2 b32: 2.61-2.75 vs 3.0-3.26) —
measure the remaining big-cell family before routing `auto` there.

    python benchmarks/conv_auto_big_ab.py
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

CELLS = [
    (8, 8, 512, 512, 16),     # 67M elements
    (16, 16, 512, 512, 32),   # 268M
    (16, 16, 256, 256, 32),   # 67M
    (32, 32, 256, 256, 16),   # 33.5M
    # borderline: just above the 2^23 banding threshold — the routing
    # cutoff should be measured, not assumed from the big cells
    (32, 32, 256, 256, 8),    # 16.8M
    (16, 16, 256, 256, 16),   # 16.8M
    (64, 64, 128, 128, 16),   # 16.8M
]


def main():
    rng = np.random.default_rng(0)
    for (c, co, h, w, b) in CELLS:
        x = jnp.asarray(rng.random((b, c, h, w)), jnp.bfloat16)
        k = jnp.asarray(rng.random((co, c, 7)) * 0.2, jnp.bfloat16)
        row = {"cell": f"C{c}->{co} {h}x{w} b{b}",
               "elems_M": round(b * c * h * w / 1e6, 1)}
        for impl in ("mxu", "direct", "pallas"):
            fn = jax.jit(lambda v, impl=impl: F.hex_conv2d(
                v, k, even_odd_offset=0, radius=2, padding=1, impl=impl))
            try:
                row[impl + "_ms"] = round(_timeit(fn, x, n=12) * 1e3, 3)
            except Exception as e:  # compile failure -> record, keep going
                row[impl + "_err"] = str(e)[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
