"""Pin down why HexViT's stem3 (96->192 @32x32 s2 bf16) costs ~0.54 ms
through the model but 0.043 ms in the isolated A/B (round 5): the A/B
closed over the kernel (a compile-time CONSTANT) while the model traces it
as a parameter.  Times the same conv with the kernel as constant vs traced
argument, with and without bias, plus the flax module apply.

    python benchmarks/stem3_traced_probe.py
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

B, C, CO, H, W = 32, 96, 192, 32, 32
DT = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, C, H, W)), DT)
    k = jnp.asarray(rng.random((CO, C, 7)) * 0.1, DT)
    bias = jnp.asarray(rng.random((CO,)) * 0.1, DT)

    def conv(v, kk, bb):
        return F.hex_conv2d(v, kk, bb, even_odd_offset=0, radius=2,
                            stride=2, padding=1, impl="direct")

    cases = {
        "const-k no-bias": jax.jit(lambda v: conv(v, k, None)),
        "const-k bias": jax.jit(lambda v: conv(v, k, bias)),
        "traced-k no-bias": jax.jit(lambda v, kk: conv(v, kk, None)),
        "traced-k bias": jax.jit(lambda v, kk, bb: conv(v, kk, bb)),
    }
    for name, fn in cases.items():
        if "traced-k bias" == name:
            t = _timeit(lambda v: fn(v, k, bias), x, n=24)
        elif name.startswith("traced"):
            t = _timeit(lambda v: fn(v, k), x, n=24)
        else:
            t = _timeit(fn, x, n=24)
        print(json.dumps({"case": name, "ms": round(t * 1e3, 4)}),
              flush=True)

    from hygrid_tpu.nn.layers import HexConv2d
    m = HexConv2d(in_channels=C, out_channels=CO, even_odd_offset=0,
                  hexkernel_radius=2, stride=2, padding=1, dtype=DT)
    p = m.init(jax.random.key(0), x)
    t = _timeit(jax.jit(lambda v: m.apply(p, v)), x, n=24)
    print(json.dumps({"case": "flax module (traced params)",
                      "ms": round(t * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
