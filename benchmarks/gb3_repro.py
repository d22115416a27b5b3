"""Deterministic repro + error capture for the banded shift kernel's gb=3
Mosaic compile failure (VERDICT r4 item 2 tail: "root-cause or
bug-ID-and-document the deterministic gb=3 Mosaic compile error instead of
fencing it").

Round 4 hit the failure twice while A/B-ing the >VMEM banded shift tier at
4K with bc=3 (3-channel frame): an unpadded batch group gb=3 makes the
banded scratch ``pltpu.VMEM((2, n_planes, band, gb, w_lane))`` and its
strided HBM->VMEM ``make_async_copy`` carry a second-minor dim of 3 —
below the sublane tile (8 for f32, 16 for bf16).  The launcher has since
pinned ``gb`` to a sublane multiple; ``HYGRID_SHIFT_GB`` re-exposes the
raw value so the compiler error itself can be captured and filed.

    python benchmarks/gb3_repro.py            # runs gb=3 and gb=8 cells
    python benchmarks/gb3_repro.py cell GB    # one cell, in-process
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(gb: int):
    os.environ["HYGRID_SHIFT_GB"] = str(gb)
    import numpy as np
    import jax.numpy as jnp
    from hygrid_tpu import lattice
    from hygrid_tpu.ops import sampling
    from hygrid_tpu.ops.geometry import _linspace_grid
    from hygrid_tpu.kernels.resample_shift import apply_plan_shift

    # the round-4 A/B shape: 4K hex->rect, 3 channels, bf16, banded source
    # (same plan construction as ops.geometry.hex_to_rect_resample)
    h_src, w_src, h1, w1 = 1080, 1920, 2160, 3840
    plan = sampling.hex_sample_plan(
        *_linspace_grid(lattice.corner_box("hex_to_rect", h_src, w_src),
                        h1, w1), h_src, w_src, "linear")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 1080, 1920)), jnp.bfloat16)
    out = apply_plan_shift(x, plan, force_banded=True)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(json.dumps({"gb": gb, "ok": True, "checksum": round(s, 2)}),
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "cell":
        run_cell(int(sys.argv[2]))
        sys.exit(0)
    here = os.path.abspath(__file__)
    for gb in (3, 8):
        r = subprocess.run([sys.executable, here, "cell", str(gb)],
                           capture_output=True, text=True, timeout=1200)
        if r.returncode == 0:
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
        else:
            err = r.stderr
            # surface the Mosaic diagnostic lines verbatim (the bug ID)
            key = [ln.strip() for ln in err.splitlines()
                   if any(t in ln for t in
                          ("Mosaic", "INTERNAL", "mosaic", "NotImplemented",
                           "Unsupported", "failed", "Error"))][:10]
            print(json.dumps({"gb": gb, "ok": False,
                              "error_lines": key}, indent=None), flush=True)
