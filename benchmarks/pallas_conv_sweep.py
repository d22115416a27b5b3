"""Per-impl single-op conv sweep INCLUDING the pallas column (VERDICT r2
weak #4: impl='pallas' had a known Mosaic compile crash at C=32/b=32/256^2
and no sweep column).  Each (config, impl) cell runs in a THROWAWAY
subprocess so a Mosaic internal error or TPU worker crash marks one cell
and the sweep continues.

    python benchmarks/pallas_conv_sweep.py            # run the sweep
    python benchmarks/pallas_conv_sweep.py one C b s impl   # one cell
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (C, batch, size) — mirrors the PERF.md impl sweep + the crash config
    (8, 16, 256),
    (16, 16, 256),
    (32, 32, 128),
    (64, 32, 128),
    (128, 32, 64),
    (32, 32, 256),     # the r2 Mosaic-crash envelope — keep LAST
]
IMPLS = ["direct", "mxu", "pallas"]


def run_one(c, b, size, impl):
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hygrid_tpu.nn import functional as F

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, c, size, size)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.2, (c, c, F.hex_kernel_num(2))),
                    jnp.bfloat16)

    def f(v):
        return F.hex_conv2d(v, k, even_odd_offset=0, radius=2, padding=1,
                            impl=impl)

    n = 24
    deltas = jnp.arange(1, n + 1, dtype=jnp.float32).reshape(n, 1, 1, 1, 1)
    xs = (x.astype(jnp.float32)[None] * (1 + deltas * 1e-2)).astype(x.dtype)

    def step(cr, v):
        return cr + jnp.sum(f(v).astype(jnp.float32)), None

    g = jax.jit(lambda vs: jax.lax.scan(step, 0.0, vs)[0])
    float(g(xs))                      # compile + warm
    t0 = time.perf_counter()
    float(g(xs))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({"C": c, "b": b, "size": size, "impl": impl,
                      "ms": round(ms, 3)}))


def main():
    rows = []
    for c, b, size in CONFIGS:
        for impl in IMPLS:
            r = subprocess.run(
                [sys.executable, __file__, "one", str(c), str(b), str(size),
                 impl], capture_output=True, text=True, timeout=1200)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if r.returncode == 0 and line:
                rows.append(json.loads(line[-1]))
                print(line[-1], flush=True)
            else:
                err = (r.stderr.strip().splitlines() or ["?"])[-1][-200:]
                rows.append({"C": c, "b": b, "size": size, "impl": impl,
                             "error": err})
                print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5])
    else:
        main()
