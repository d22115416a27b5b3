"""Round-4 targeted follow-ups to the segment profiles:

* ``stems``  — HexViT's stride-2 stem convs per impl (stem0 = 9.35 ms of
  the 26.6 ms model on the mxu path; strided slices at stride 2 are
  relayouts).
* ``vit_gaps`` — where the unattributed ~10 ms of HexViT goes.
* ``tconv``  — the UNet up1 tconv per executor (fwd measured 2.55 ms vs
  up0's 0.134).
* ``unet_overhead`` — train_step minus fwd+bwd (measured ~7.9 ms).

    python benchmarks/prof_targets.py [seg ...]
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

DT = jnp.bfloat16


def _rep(name, per, n_img):
    print(json.dumps({"seg": name, "ms": round(per * 1e3, 4),
                      "img/s": round(n_img / per, 1)}), flush=True)


def stems():
    from hygrid_tpu.nn import functional as F
    rng = np.random.default_rng(0)
    B = 32
    for cin, cout, hh, ww in [(3, 24, 256, 256), (24, 48, 128, 128),
                              (48, 96, 64, 64)]:
        x = jnp.asarray(rng.random((B, cin, hh, ww)), DT)
        k = jnp.asarray(rng.random((cout, cin, 7)) * 0.2, DT)
        for impl in ("mxu", "direct", "type1"):
            f = jax.jit(lambda v, impl=impl, k=k: F.hex_conv2d(
                v, k, even_odd_offset=0, radius=2, stride=2, padding=1,
                impl=impl))
            try:
                per = _timeit(f, x, n=24)
                _rep(f"stem {cin}->{cout}@{hh} s2 {impl}", per, B)
            except Exception as e:
                print(json.dumps({"seg": f"stem {cin}->{cout} {impl}",
                                  "error": str(e)[:200]}), flush=True)


def vit_gaps():
    from hygrid_tpu.models import HexViT
    from hygrid_tpu.models.hexvit import _Block
    import flax.linen as nn
    rng = np.random.default_rng(0)
    B = 32
    model = HexViT(dim=192, depth=6, heads=3, patch_halvings=4, dtype=DT)
    hexed = jnp.asarray(rng.random((B, 3, 256, 256)), DT)
    params = model.init(jax.random.key(0), hexed[:1])

    @jax.jit
    def model_only(v):
        return model.apply(params, v)
    _rep("model from hex", _timeit(model_only, hexed, n=16), B)

    # the stem chain exactly as the model runs it (convs + gelus)
    from hygrid_tpu.nn.layers import HexConv2d
    widths = [24, 48, 96, 192]
    mods, prms = [], []
    cur = hexed
    for i, width in enumerate(widths):
        m = HexConv2d(in_channels=cur.shape[1], out_channels=width,
                      even_odd_offset=0, hexkernel_radius=2, stride=2,
                      padding=1)
        p = m.init(jax.random.key(i), cur)
        mods.append(m); prms.append(p)
        cur = m.apply(p, cur)

    @jax.jit
    def stem_chain(v):
        h = v
        for i, (m, p) in enumerate(zip(mods, prms)):
            h = m.apply(p, h)
            if i < 3:
                h = jax.nn.gelu(h)
        return h
    _rep("stem chain e2e (4 convs + gelus)", _timeit(stem_chain, hexed,
                                                     n=16), B)

    toks = jnp.asarray(rng.random((B, 256, 192)), DT)
    blk = _Block(dim=192, heads=3, dtype=DT)
    bp = blk.init(jax.random.key(9), toks)
    head = nn.Dense(10, dtype=DT)
    hp = head.init(jax.random.key(10), toks[:, 0])
    ln = nn.LayerNorm(dtype=DT)
    lp = ln.init(jax.random.key(11), toks)

    @jax.jit
    def token_pipeline(t):
        for _ in range(6):
            t = blk.apply(bp, t)
        t = ln.apply(lp, t)
        return head.apply(hp, t.mean(axis=1))
    _rep("token pipeline (6 blocks + LN + pool + head)",
         _timeit(token_pipeline, toks, n=24), B)


def tconv():
    from hygrid_tpu.nn import experimental as E
    rng = np.random.default_rng(1)
    B = 8
    for cin, cout, hh, ww, tag in [(64, 32, 128, 127, "up1"),
                                   (128, 64, 64, 63, "up0")]:
        x = jnp.asarray(rng.random((B, hh, ww, cin)), DT)
        k = jnp.asarray(rng.random((cout, cin, 7)) * 0.2, DT)
        for impl in ("phase", "matmul", "canvas"):
            f = jax.jit(lambda v, impl=impl, k=k: E.hex_conv_transpose2d(
                v, k, radius=2, stride=2, impl=impl, data_format="NHWC"))
            try:
                per = _timeit(f, x, n=24)
                _rep(f"tconv {tag} {impl} fwd", per, B)

                def fb(v, impl=impl, k=k):
                    def loss(kk, vv):
                        return jnp.sum(E.hex_conv_transpose2d(
                            vv, kk, radius=2, stride=2, impl=impl,
                            data_format="NHWC").astype(jnp.float32) ** 2)
                    return jax.value_and_grad(loss)(k, v)
                per = _timeit(jax.jit(fb), x, n=16)
                _rep(f"tconv {tag} {impl} fwd+bwd", per, B)
            except Exception as e:
                print(json.dumps({"seg": f"tconv {tag} {impl}",
                                  "error": str(e)[:200]}), flush=True)


def unet_overhead():
    from hygrid_tpu.models import (HexUNet, create_train_state, train_step,
                                   hexify_batch)
    import optax
    rng = np.random.default_rng(0)
    B = 8
    x = jnp.asarray(rng.random((B, 3, 512, 512)), jnp.float32)
    hexed = hexify_batch(x)
    labels = jnp.asarray(rng.integers(0, 4, (B, 256, 256)))
    model = HexUNet(num_classes=4, widths=(32, 64, 128), norm="GN",
                    dtype=DT)
    state = create_train_state(model, jax.random.key(0), hexed[:1])

    def full(v, labels):
        new_state, m = train_step(state, hexify_batch(v), labels)
        return new_state.params, m["loss"]
    _rep("train step full (w/ hexify)", _timeit(full, x, labels, n=12), B)

    def from_hex(v, labels):
        new_state, m = train_step(state, v, labels)
        return new_state.params, m["loss"]
    _rep("train step from hex", _timeit(from_hex, hexed, labels, n=12), B)

    def vg_only(v, labels):
        def loss_fn(params):
            logits = model.apply({"params": params}, v, train=True)
            lg = jnp.moveaxis(logits, 1, -1)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, labels).mean()
        l, g = jax.value_and_grad(loss_fn)(state.params)
        return l, g
    _rep("value_and_grad(xent) only", _timeit(vg_only, hexed, labels,
                                              n=12), B)

    _rep("hexify_batch", _timeit(jax.jit(hexify_batch), x, n=24), B)


ALL = {"stems": stems, "vit_gaps": vit_gaps, "tconv": tconv,
       "unet_overhead": unet_overhead}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:
            print(json.dumps({"seg": n,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
