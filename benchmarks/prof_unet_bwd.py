"""Segment profile of the HexUNet-512^2 TRAIN step (VERDICT r3 item 2).

Round-3 state: 1,515 img/s inference vs 361-363 train (4.2x) with PERF.md
attributing the gap to "transposed convs and resizes differentiate in
XLA".  This harness times each segment fwd and fwd+bwd differentially so
the attribution is measured, not guessed, before any kernel is written.

    python benchmarks/prof_unet_bwd.py [seg ...]
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

B = 8
DT = jnp.bfloat16


def _rep(name, per, n_img=B):
    print(json.dumps({"seg": name, "ms": round(per * 1e3, 4),
                      "img/s": round(n_img / per, 1)}), flush=True)


def full_train():
    from hygrid_tpu.models import HexUNet
    from hygrid_tpu.models import (create_train_state, train_step,
                                   hexify_batch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 3, 512, 512)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (B, 256, 256)))
    model = HexUNet(num_classes=4, widths=(32, 64, 128), norm="GN", dtype=DT)
    state = create_train_state(model, jax.random.key(0), hexify_batch(x[:1]))

    def f(v, labels):
        new_state, metrics = train_step(state, hexify_batch(v), labels)
        return new_state.params, metrics["loss"]

    _rep("full train step", _timeit(f, x, labels, n=12))

    def fwd(v):
        return model.apply({"params": state.params}, hexify_batch(v))
    _rep("full forward", _timeit(fwd, x, n=16))


def _tconv_mod(cin, cout):
    from hygrid_tpu.models.hexunet import HexConvTranspose2d
    return HexConvTranspose2d(in_channels=cin, out_channels=cout,
                              even_odd_offset=0, hexkernel_radius=2,
                              stride=2, data_format="NHWC")


def tconv():
    """The two decoder transposed convs in isolation (NHWC, bf16)."""
    rng = np.random.default_rng(1)
    # decoder shapes for 512^2 input -> hex (256, 256): enc grid
    # (256,256)->(128,127)->(64,63)
    for cin, cout, h, w in [(128, 64, 64, 63), (64, 32, 128, 127)]:
        m = _tconv_mod(cin, cout)
        x = jnp.asarray(rng.random((B, h, w, cin)), DT)
        params = m.init(jax.random.key(0), x)

        def fwd(v):
            return m.apply(params, v)
        _rep(f"tconv {cin}->{cout} @{h}x{w} fwd", _timeit(fwd, x, n=32))

        def fb(v):
            def loss(p, vv):
                return jnp.sum(m.apply(p, vv).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(params, v)
            return l, g
        _rep(f"tconv {cin}->{cout} @{h}x{w} fwd+bwd", _timeit(fb, x, n=24))


def decstack():
    """Decoder skip-join stacks (fused concat split) fwd and fwd+bwd."""
    from hygrid_tpu.nn.layers import HexConvStack
    rng = np.random.default_rng(2)
    for width, h, w in [(64, 128, 127), (32, 256, 256)]:
        m = HexConvStack(in_channels=2 * width, width=width, depth=1,
                         hexkernel_radius=2, norm="GN", num_groups=8,
                         data_format="NHWC", dtype=DT)
        x = jnp.asarray(rng.random((B, h, w, width)), DT)
        skip = jnp.asarray(rng.random((B, h, w, width)), DT)
        params = m.init(jax.random.key(0), x, extra=skip)

        def fwd(v):
            return m.apply(params, v, extra=skip)
        _rep(f"decstack w{width} @{h}x{w} fwd", _timeit(fwd, x, n=24))

        def fb(v):
            def loss(p, vv):
                return jnp.sum(m.apply(p, vv, extra=skip).astype(
                    jnp.float32) ** 2)
            return jax.value_and_grad(loss)(params, v)
        _rep(f"decstack w{width} @{h}x{w} fwd+bwd", _timeit(fb, x, n=16))


def encoder():
    """Packed encoder chain (stack -> packed pool -> ...) fwd / fwd+bwd
    approximated by the UNet encoder module sequence."""
    from hygrid_tpu.models import HexUNet
    from hygrid_tpu.models import hexify_batch
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((B, 3, 512, 512)), jnp.float32)
    model = HexUNet(num_classes=4, widths=(32, 64, 128), norm="GN", dtype=DT)
    hexed = hexify_batch(x)
    params = model.init(jax.random.key(0), hexed[:1])["params"]

    def fwd(v):
        return model.apply({"params": params}, v)
    _rep("unet fwd from hex", _timeit(fwd, hexed, n=16))

    def fb(v):
        def loss(p, vv):
            return jnp.sum(model.apply({"params": p}, vv).astype(
                jnp.float32) ** 2)
        return jax.value_and_grad(loss)(params, v)
    _rep("unet fwd+bwd from hex", _timeit(fb, hexed, n=12))


def hexify():
    from hygrid_tpu.models import hexify_batch
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((B, 3, 512, 512)), jnp.float32)
    _rep("hexify_batch fwd", _timeit(hexify_batch, x, n=32))


def pixelshuffle():
    """The alternative upsampler for comparison."""
    from hygrid_tpu.models.hexunet import HexPixelShuffleUpsample
    rng = np.random.default_rng(5)
    for ch, h, w in [(64, 64, 63), (32, 128, 127)]:
        m = HexPixelShuffleUpsample(channels=ch, factor=2)
        x = jnp.asarray(rng.random((B, 4 * ch, h, w)), DT)
        params = m.init(jax.random.key(0), x)

        def fb(v):
            def loss(p, vv):
                return jnp.sum(m.apply(p, vv).astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(params, v)
        _rep(f"pixshuf {ch} @{h}x{w} fwd+bwd", _timeit(fb, x, n=24))


ALL = {"full_train": full_train, "tconv": tconv, "decstack": decstack,
       "encoder": encoder, "hexify": hexify, "pixelshuffle": pixelshuffle}

if __name__ == "__main__":
    names = sys.argv[1:] or ["full_train", "tconv", "decstack", "encoder",
                             "hexify"]
    for n in names:
        try:
            ALL[n]()
        except Exception as e:
            print(json.dumps({"seg": n,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
