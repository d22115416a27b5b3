"""Segment profile of the HexViT bench config (VERDICT r3 weak #6:
"1,182 img/s for a d192/L6 body is far off what the parts suggest ...
Where do the 0.84 ms/img go? Nobody measured.").

    python benchmarks/prof_hexvit.py
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

B = 32
DT = jnp.bfloat16


def _rep(name, per):
    print(json.dumps({"seg": name, "ms": round(per * 1e3, 4),
                      "img/s": round(B / per, 1)}), flush=True)


def main():
    from hygrid_tpu.models import HexViT, hexify_batch
    from hygrid_tpu.models.hexvit import _Block
    from hygrid_tpu.nn.layers import HexConv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 3, 512, 512)), jnp.float32)
    model = HexViT(dim=192, depth=6, heads=3, patch_halvings=4, dtype=DT)
    params = model.init(jax.random.key(0), hexify_batch(x[:1]))

    @jax.jit
    def full(v):
        return model.apply(params, hexify_batch(v.astype(DT)))
    _rep("full (hexify + model)", _timeit(full, x, n=16))

    hexed = hexify_batch(x).astype(DT)
    @jax.jit
    def model_only(v):
        return model.apply(params, v)
    _rep("model from hex", _timeit(model_only, hexed, n=16))

    _rep("hexify", _timeit(jax.jit(hexify_batch), x, n=32))

    # stem convs one by one (same widths as HexViT with halvings=4, d=192)
    widths = [24, 48, 96, 192]
    cin, hh, ww = 3, 256, 256
    cur = hexed
    for i, width in enumerate(widths):
        m = HexConv2d(in_channels=cin, out_channels=width, even_odd_offset=0,
                      hexkernel_radius=2, stride=2, padding=1)
        p = m.init(jax.random.key(i), cur)
        f = jax.jit(lambda v, m=m, p=p: m.apply(p, v))
        _rep(f"stem{i} {cin}->{width} @{hh}x{ww} s2", _timeit(f, cur, n=24))
        cur = f(cur)
        cin, hh, ww = width, hh // 2, ww // 2

    # the transformer body on ready-made tokens
    tokens = jnp.asarray(rng.random((B, 256, 192)), DT)
    blk = _Block(dim=192, heads=3, dtype=DT)
    bp = blk.init(jax.random.key(9), tokens)

    @jax.jit
    def six_blocks(t):
        for _ in range(6):
            t = blk.apply(bp, t)
        return t
    _rep("6 transformer blocks (256 tok, d192)", _timeit(six_blocks, tokens,
                                                         n=24))


if __name__ == "__main__":
    main()
