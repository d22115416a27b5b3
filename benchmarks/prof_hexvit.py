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

    # hexify in the model's compute dtype (the round-5 first cut timed the
    # f32 form here and f32 stems below, inflating both segments —
    # exposed by benchmarks/stem3_ab.py, whose bf16 stem3 ran 0.043 ms
    # against the 0.559 printed here; attribution corrected 2026-08-21)
    _rep("hexify (bf16)", _timeit(jax.jit(
        lambda v: hexify_batch(v.astype(DT))), x, n=32))

    # stem convs one by one (same widths as HexViT with halvings=4, d=192)
    widths = [24, 48, 96, 192]
    cin, hh, ww = 3, 256, 256
    cur = hexed
    for i, width in enumerate(widths):
        m = HexConv2d(in_channels=cin, out_channels=width, even_odd_offset=0,
                      hexkernel_radius=2, stride=2, padding=1, dtype=DT)
        p = m.init(jax.random.key(i), cur)
        f = jax.jit(lambda v, m=m, p=p: m.apply(p, v))
        _rep(f"stem{i} {cin}->{width} @{hh}x{ww} s2", _timeit(f, cur, n=24))
        cur = f(cur)
        cin, hh, ww = width, hh // 2, ww // 2

    # cumulative stem prefixes (round 5): the per-stem probes above are
    # clean in isolation (stem3_traced_probe.py: every form 0.01-0.07 ms)
    # yet the same cell reports ~0.54 ms in this process — attribute
    # in-context by timing chained prefixes, whose DIFFERENCES are the
    # honest in-model per-stage costs
    mods, ps = [], []
    cin2 = 3
    cur2 = hexed
    for i, width in enumerate(widths):
        m2 = HexConv2d(in_channels=cin2, out_channels=width,
                       even_odd_offset=0, hexkernel_radius=2, stride=2,
                       padding=1, dtype=DT)
        ps.append(m2.init(jax.random.key(i), cur2))
        mods.append(m2)
        cur2 = m2.apply(ps[-1], cur2)
        cin2 = width

    def prefix(k):
        def f(v):
            for m2, p2 in zip(mods[:k], ps[:k]):
                v = m2.apply(p2, v)
            return v
        return jax.jit(f)
    prev = 0.0
    for k in range(1, 5):
        t = _timeit(prefix(k), hexed, n=24)
        _rep(f"stems 0..{k-1} cumulative (delta {round((t-prev)*1e3, 4)})",
             t)
        prev = t

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
