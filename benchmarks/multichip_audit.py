"""Multichip audit: the sharded north-star on an 8-device mesh, with the
compiled HLO's collective operations counted and reported (VERDICT r3
item 4: "nothing yet proves the sharded path is the fast path" — this
makes the communication pattern inspectable and equality-tested).

Runs on 8 virtual CPU devices by default (same mechanism as the driver's
``dryrun_multichip``); on a real slice it runs unchanged.

    python benchmarks/multichip_audit.py
"""
from __future__ import annotations

import json
import os
import re
import sys

if "--real" not in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
                "reduce-scatter", "all-to-all")


def count_collectives(compiled_text: str) -> dict:
    counts = {}
    for op in _COLLECTIVES:
        n = len(re.findall(rf"\b{op}(?:-start)?\(", compiled_text))
        if n:
            counts[op] = n
    return counts


def audit_northstar_spatial():
    """The north-star pipeline (rect->hex -> 10-layer conv stack ->
    hex->rect) row-sharded over sp=8: per-device slabs, ppermute halos.
    Audits the compiled HLO and equality-checks vs the monolithic run."""
    import hygrid_tpu as hg
    from hygrid_tpu.parallel import create_mesh
    from hygrid_tpu.parallel.spatial import sharded_resample, sharded_hex_conv2d

    mesh = create_mesh({"sp": 8})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 128, 128)), jnp.float32)
    kerns = [jnp.asarray(rng.random((3, 3, 7)) * 0.1, jnp.float32)
             for _ in range(10)]

    def pipeline(v):
        hexed = sharded_resample(v, mesh, "rect_to_hex", (64, 128),
                                 "bilinear")
        h = hexed
        for k in kerns:
            h = sharded_hex_conv2d(h, k, mesh, even_odd_offset=0, radius=2)
        return sharded_resample(h, mesh, "hex_to_rect", (128, 128), "linear")

    jitted = jax.jit(pipeline)
    compiled = jitted.lower(x).compile()
    counts = count_collectives(compiled.as_text())

    got = np.asarray(jitted(x))

    def mono(v):
        hexed = hg.rect_to_hex_resample(v, (64, 128), "bilinear")
        h = hexed
        from hygrid_tpu.nn import functional as F
        for k in kerns:
            h = F.hex_conv2d(h, k, even_odd_offset=0, radius=2, padding=1)
        return hg.hex_to_rect_resample(h, (128, 128), "linear")

    want = np.asarray(jax.jit(mono)(x))
    err = float(np.abs(got - want).max())
    print(json.dumps({"audit": "northstar spatial sp=8",
                      "collectives": counts, "max_err": err,
                      "n_devices": len(jax.devices())}))
    assert err < 1e-4, err
    # halos must ride neighbour permutes, not gathers: the resample +
    # 10 convs need O(12) permute pairs, and nothing should all-gather
    # the image
    assert counts.get("collective-permute", 0) >= 12, counts
    assert counts.get("all-gather", 0) <= 4, counts


def audit_train_step():
    """The flagship dp x sp x tp train step (the dryrun path) — collective
    census of the compiled step."""
    import __graft_entry__ as ge
    stats = ge.dryrun_multichip(8, return_compiled_text=True) \
        if "return_compiled_text" in ge.dryrun_multichip.__code__.co_varnames \
        else None
    if stats is None:
        ge.dryrun_multichip(8)
        print(json.dumps({"audit": "train step dp*sp*tp",
                          "collectives": "dryrun ok (no text hook)"}))
        return
    counts = count_collectives(stats)
    print(json.dumps({"audit": "train step dp*sp*tp",
                      "collectives": counts}))


if __name__ == "__main__":
    audit_northstar_spatial()
    audit_train_step()
