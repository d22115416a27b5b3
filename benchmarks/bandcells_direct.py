"""Complete the large-conv routing picture: the band check timed pallas vs
auto(=mxu) at the two former crash cells but never 'direct'; the
conv_auto_big_ab sweep shows direct winning several big cells.

    python benchmarks/bandcells_direct.py
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

CELLS = [(32, 32, 256, 256, 32), (64, 64, 128, 128, 32)]


def main():
    rng = np.random.default_rng(0)
    for (c, co, h, w, b) in CELLS:
        x = jnp.asarray(rng.random((b, c, h, w)), jnp.bfloat16)
        k = jnp.asarray(rng.random((co, c, 7)) * 0.2, jnp.bfloat16)
        row = {"cell": f"C{c}->{co} {h}x{w} b{b}"}
        for impl in ("direct", "mxu", "pallas"):
            fn = jax.jit(lambda v, impl=impl: F.hex_conv2d(
                v, k, even_odd_offset=0, radius=2, padding=1, impl=impl))
            row[impl + "_ms"] = round(_timeit(fn, x, n=12) * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
