"""North-star benchmark: rect->hex->rect round-trip + 10-layer hex-conv
stack, megapixels of 512x512 RGB input processed per second per chip.

Target (BASELINE.json / BASELINE.md): >= 500 Mpix/sec/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import hygrid_tpu as hg
from hygrid_tpu.nn import functional as F

BASELINE_MPIX_S = 500.0


def build_pipeline(batch: int, size: int, channels: int, layers: int,
                   radius: int, dtype):
    rng = np.random.default_rng(0)
    kernels = [jnp.asarray(rng.normal(0, 0.1, (channels, 3, F.hex_kernel_num(radius))), dtype)] + [
        jnp.asarray(rng.normal(0, 0.1, (channels, channels, F.hex_kernel_num(radius))), dtype)
        for _ in range(layers - 1)]
    back_kernel = jnp.asarray(rng.normal(0, 0.1, (3, channels, F.hex_kernel_num(radius))), dtype)

    def pipeline(x):
        hexed = hg.rect_to_hex_resample(x, (size // 2, size // 2), "bilinear")
        h = hexed.astype(dtype)
        for k in kernels:
            h = F.hex_conv2d(h, k, even_odd_offset=0, radius=radius,
                             padding=radius - 1, impl="direct")
            h = jax.nn.relu(h)
        h = F.hex_conv2d(h, back_kernel, even_odd_offset=0, radius=radius,
                         padding=radius - 1, impl="direct")
        return hg.hex_to_rect_resample(h.astype(jnp.float32), (size, size),
                                       "linear")

    return pipeline


def main():
    batch, size, channels, layers, radius = 16, 512, 16, 10, 2
    dtype = jnp.bfloat16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((batch, 3, size, size)), jnp.float32)

    pipe = jax.jit(build_pipeline(batch, size, channels, layers, radius, dtype))
    out = pipe(x)
    jax.block_until_ready(out)  # compile + warm up

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pipe(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

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
