"""A/B: HexViT transformer body with flax's unfused attention vs
``jax.nn.dot_product_attention`` (XLA fused-attention path) — VERDICT r4
item 7: "if the transformer body now dominates, route attention through
jax.nn.dot_product_attention (fused) and add the roofline row".

Times the 6-block body on ready-made tokens (the segment prof_hexvit.py
isolates) and the full model end-to-end, both differentially.

    python benchmarks/hexvit_attn_ab.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from suite import _timeit  # noqa: E402

B, T, D, HEADS, DEPTH = 32, 256, 192, 3, 6
DT = jnp.bfloat16


def fused_attention_fn(query, key, value, bias=None, mask=None,
                       dropout_rng=None, dropout_rate=0.0, **_):
    # flax hands (B, T, heads, head_dim); jax.nn.dot_product_attention
    # takes the same BTNH layout
    return jax.nn.dot_product_attention(query, key, value, bias=bias,
                                        mask=mask)


class Block(nn.Module):
    fused: bool

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=DT, param_dtype=jnp.float32)
        extra = ({"attention_fn": fused_attention_fn} if self.fused else {})
        y = nn.LayerNorm(**kw)(x)
        y = nn.MultiHeadDotProductAttention(num_heads=HEADS, name="attn",
                                            **kw, **extra)(y, y)
        x = x + y
        y = nn.LayerNorm(**kw)(x)
        y = nn.Dense(4 * D, **kw)(y)
        y = nn.gelu(y)
        y = nn.Dense(D, **kw)(y)
        return x + y


def main():
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.random((B, T, D)), DT)
    for fused in (False, True):
        blk = Block(fused=fused)
        bp = blk.init(jax.random.key(9), tokens)

        @jax.jit
        def six(t, bp=bp, blk=blk):
            for _ in range(DEPTH):
                t = blk.apply(bp, t)
            return t

        per = _timeit(six, tokens, n=32)
        # numerics cross-check on the first pass
        print(json.dumps({
            "variant": "fused" if fused else "flax-unfused",
            "body_ms": round(per * 1e3, 4),
            "img/s(body-only)": round(B / per, 1)}), flush=True)

    # agreement check between the two attention forms
    blk_a = Block(fused=False)
    p = blk_a.init(jax.random.key(9), tokens)
    ya = jax.jit(lambda t: blk_a.apply(p, t))(tokens)
    blk_b = Block(fused=True)
    yb = jax.jit(lambda t: blk_b.apply(p, t))(tokens)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(json.dumps({"max_abs_err_one_block": err}), flush=True)


if __name__ == "__main__":
    main()
