"""North-star benchmark: rect->hex->rect round-trip + 10-layer hex-conv
stack, megapixels of 512x512 RGB input processed per second per chip.

Target (BASELINE.json / BASELINE.md): >= 500 Mpix/sec/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Pipeline: fused rect->hex gather plan -> 10-layer hex conv stack run
entirely in the packed even/odd-row domain by the Pallas kernel
(kernels/conv_pallas.py) with a final 16->3 projection -> fused
hex->rect gather plan.  The 3->16 stem and 16->3 projection ride the same
uniform-width stack via zero-padded channels (zero input channels
contribute nothing, so this is exactly the narrow conv).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import hygrid_tpu as hg
from hygrid_tpu.nn import functional as F
from hygrid_tpu.kernels.conv_pallas import hex_conv_stack_pallas

BASELINE_MPIX_S = 500.0


def build_pipeline(size: int, channels: int, layers: int, radius: int, dtype):
    rng = np.random.default_rng(0)
    kn = F.hex_kernel_num(radius)
    stem = np.zeros((channels, channels, kn), np.float32)
    stem[:, :3] = rng.normal(0, 0.1, (channels, 3, kn))
    kernels = [jnp.asarray(stem, dtype)] + [
        jnp.asarray(rng.normal(0, 0.1, (channels, channels, kn)), dtype)
        for _ in range(layers - 1)]
    proj = np.zeros((channels, channels, kn), np.float32)
    proj[:3] = rng.normal(0, 0.1, (3, channels, kn))
    kernels.append(jnp.asarray(proj, dtype))

    def pipeline(x):
        # the whole pipeline runs in bf16 (the production inference dtype);
        # the resample kernels run native 16-bit operands at the full MXU
        # rate when fed bf16 (f32 inputs would run 6-pass bit-parity mode)
        hexed = hg.rect_to_hex_resample(x.astype(dtype),
                                        (size // 2, size // 2), "bilinear")
        h = jnp.pad(hexed, ((0, 0), (0, channels - 3), (0, 0), (0, 0)))
        h = hex_conv_stack_pallas(h, kernels, None, radius=radius,
                                  final_activation=False)
        h = h[:, :3]
        return hg.hex_to_rect_resample(h, (size, size),
                                       "linear").astype(jnp.float32)

    return pipeline


def main():
    batch, size, channels, layers, radius = 16, 512, 16, 10, 2
    dtype = jnp.bfloat16
    rng = np.random.default_rng(1)
    # Airtight DIFFERENTIAL timing over the tunnelled device: iterations
    # run inside ONE jitted lax.scan (sequential by construction — no
    # launch elision, no per-iteration dispatch latency); each iteration's
    # input is derived IN-BODY as base*(1 + k*1e-2) — DISTINCT in the
    # compute dtype (the r2 additive 1e-6 deltas underflowed in bf16,
    # VERDICT r2 weak #2) and never materialised n-fold in HBM; every
    # output is reduced into a carried scalar FETCHED in the timed region.
    # The reported time is the (T(2n) - T(n)) / n slope over two scan
    # lengths: the dispatch+fetch round trip through the dev tunnel is a
    # FIXED ~26 ms that a single T(n)/n measurement silently adds as
    # ~26/n ms per iteration (round-3 n-sweep, PERF.md) — the slope
    # cancels it exactly.
    n_iters = 48
    base = jnp.asarray(rng.random((batch, 3, size, size)), jnp.float32)
    pipe = build_pipeline(size, channels, layers, radius, dtype)

    def step(b, c, d):
        x = b * (1.0 + d)
        return c + jnp.sum(pipe(x)), None

    g = jax.jit(lambda b, ds: jax.lax.scan(
        lambda c, d: step(b, c, d), 0.0, ds)[0])
    d1 = jnp.arange(1, n_iters + 1, dtype=jnp.float32) * 1e-2
    d2 = jnp.arange(1, 2 * n_iters + 1, dtype=jnp.float32) * 1e-2
    # harness invariant: iteration inputs stay distinct in the COMPUTE dtype
    probe = base.reshape(-1)[:8]
    pair = jnp.stack([probe * (1.0 + d1[0]),
                      probe * (1.0 + d1[1])]).astype(dtype)
    assert bool(jnp.any(pair[0] != pair[1])), \
        "iteration inputs collapsed to identical values in the compute dtype"
    float(g(base, d1))  # compile + warm both scan lengths
    float(g(base, d2))

    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        val = float(g(base, d1))
        t1 = min(t1, time.perf_counter() - t0)
        assert np.isfinite(val)
        t0 = time.perf_counter()
        val = float(g(base, d2))
        t2 = min(t2, time.perf_counter() - t0)
        assert np.isfinite(val)
    dt = t2 - t1
    mpix = batch * size * size * n_iters / 1e6
    value = mpix / dt
    print(json.dumps({
        "metric": "rect->hex->rect roundtrip + 10-layer hexconv stack, 512^2 RGB",
        "value": round(value, 2),
        "unit": "Mpix/sec/chip",
        "vs_baseline": round(value / BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
