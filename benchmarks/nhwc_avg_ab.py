"""A/B: NHWC 'average' pooling — round-5 native path vs the old NCHW
round trip (VERDICT r4 weak #7).  The max/min fused form was always
NHWC-native; 'average'/general windows used to moveaxis to NCHW and back,
two whole-tensor relayouts on the model layout.

    python benchmarks/nhwc_avg_ab.py
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


def old_roundtrip(x, meth, ks, st):
    out = F.hex_pool2d(jnp.moveaxis(x, -1, 1), meth, ks, st)
    return jnp.moveaxis(out, 1, -1)


def main():
    rng = np.random.default_rng(0)
    for (b, h, w, c) in [(32, 128, 128, 64), (32, 256, 256, 32)]:
        x = jnp.asarray(rng.random((b, h, w, c)), jnp.bfloat16)
        fn_new = jax.jit(lambda v: F.hex_pool2d(v, "average", 2, 2,
                                                data_format="NHWC"))
        fn_old = jax.jit(lambda v: old_roundtrip(v, "average", 2, 2))
        err = float(jnp.max(jnp.abs(fn_new(x).astype(jnp.float32)
                                    - fn_old(x).astype(jnp.float32))))
        tn = _timeit(fn_new, x, n=32)
        to = _timeit(fn_old, x, n=32)
        print(json.dumps({"shape": f"b{b} {h}x{w} c{c}",
                          "native_ms": round(tn * 1e3, 4),
                          "roundtrip_ms": round(to * 1e3, 4),
                          "speedup": round(to / tn, 2),
                          "max_err": err}), flush=True)


if __name__ == "__main__":
    main()
