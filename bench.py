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
    # Airtight timing over the tunnelled device: all iterations run inside
    # ONE jitted lax.scan over n DISTINCT stacked inputs (sequential by
    # construction — no launch elision, no per-iteration dispatch latency),
    # every iteration's output fully reduced into a carried scalar that is
    # FETCHED inside the timed region, so nothing can be deferred.  The one
    # dispatch+fetch round trip amortises over n.
    n_iters = 48
    # one host->device transfer of a single batch; the n DISTINCT iteration
    # inputs are derived ON DEVICE by broadcast-adding per-iteration deltas
    # (shipping n full copies through the dev tunnel would dominate wall
    # time and HBM)
    base = jnp.asarray(rng.random((batch, 3, size, size)), jnp.float32)
    # RELATIVE per-iteration deltas, sized to survive the pipeline's bf16
    # cast (eps(1.0) = 2^-8 ~ 4e-3 < 1e-2): the r2 additive k*1e-6 deltas
    # underflowed to bit-identical bf16 inputs, silently disarming the
    # distinct-inputs defense against launch elision (VERDICT r2 weak #2)
    deltas = (jnp.arange(1, n_iters + 1, dtype=jnp.float32)
              .reshape(n_iters, 1, 1, 1, 1) * 1e-2)
    make_xs = jax.jit(lambda b, scale: b[None] * (1.0 + scale * deltas))
    xs_time = make_xs(base, 1.0)
    xs_warm = make_xs(base, 2.0)
    # harness invariant: iteration inputs stay distinct in the COMPUTE dtype
    pair = jnp.asarray(xs_time[:2]).astype(dtype)
    assert bool(jnp.any(pair[0] != pair[1])), \
        "iteration inputs collapsed to identical values in the compute dtype"

    pipe = build_pipeline(size, channels, layers, radius, dtype)

    def step(c, x):
        return c + jnp.sum(pipe(x)), None

    g = jax.jit(lambda xs: jax.lax.scan(step, 0.0, xs)[0])
    float(g(xs_warm))  # compile + warm up + fetch
    del xs_warm        # free 4.8 GB of HBM before the timed run

    t0 = time.perf_counter()
    val = float(g(xs_time))
    dt = time.perf_counter() - t0
    assert np.isfinite(val)
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
