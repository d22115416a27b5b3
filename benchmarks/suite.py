"""The five BASELINE.json benchmark configs, each printing one JSON line.

Run on TPU:  python benchmarks/suite.py [config ...]
Configs: roundtrip | batched_filter | hexcnn | hexcnn512 | hexunet |
hexvit | hexcnn512_train | hexunet_train | resample4k | video | mosaic | all

(``bench.py`` at the repo root is the driver-facing north-star metric and
equals ``roundtrip`` here.)
"""
from __future__ import annotations

import json
import os
import sys
import time

# make `python benchmarks/suite.py` work as documented: the script dir is
# on sys.path, the repo root (the hygrid_tpu package parent) is not
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _timeit(f, *a, n=16, reps=3):
    """Airtight *differential* timing over a high-latency tunnelled device.

    All iterations run inside ONE jitted ``lax.scan``; each iteration's
    input is derived IN-BODY as ``base * (1 + k*1e-2)`` (distinct in every
    compute dtype down to bf16 — the round-2 additive 1e-6 deltas
    underflowed, VERDICT r2 weak #2 — and never materialised n-fold in
    HBM), and every output is fully reduced into a carried scalar fetched
    inside the timed region, so no launch can be elided or deferred.

    The per-iteration time is ``(T(2n) - T(n)) / n`` with each T the
    min over ``reps`` runs: the dispatch+fetch round trip through the dev
    tunnel is a FIXED ~26 ms that ``T(n)/n`` silently adds as ~26/n ms to
    every iteration (round-3 n-sweep: an identity op 'measured'
    3.47/1.01/0.19 ms/iter at n=8/32/128) — the difference of two scan
    lengths cancels it exactly.  The derive-multiply costs one extra
    input-sized pass per iteration, negligible for every suite config."""
    base = jnp.asarray(a[0])
    rest = a[1:]

    def step(b, c, d):
        x = (b.astype(jnp.float32) * (1.0 + d)).astype(base.dtype)
        out = f(x, *rest)
        s = sum(jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out))
        return c + s, None

    g = jax.jit(lambda b, ds: jax.lax.scan(
        lambda c, d: step(b, c, d), 0.0, ds)[0])
    d1 = jnp.arange(1, n + 1, dtype=jnp.float32) * 1e-2
    d2 = jnp.arange(1, 2 * n + 1, dtype=jnp.float32) * 1e-2
    # invariant: distinct in bf16, the narrowest compute dtype in the suite
    probe = base.reshape(-1)[:8].astype(jnp.float32)
    pair = jnp.stack([probe * (1.0 + d1[0]),
                      probe * (1.0 + d1[1])]).astype(jnp.bfloat16)
    assert bool(jnp.any(pair[0] != pair[1])), \
        "iteration inputs collapsed to identical values in the compute dtype"
    float(g(base, d1))  # compile + warm both scan lengths
    float(g(base, d2))
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        val = float(g(base, d1))
        t1 = min(t1, time.perf_counter() - t0)
        assert np.isfinite(val)
        t0 = time.perf_counter()
        val = float(g(base, d2))
        t2 = min(t2, time.perf_counter() - t0)
        assert np.isfinite(val)
    per = (t2 - t1) / n
    if per <= 0:  # tunnel-latency noise exceeded the doubled work: the op
        return t2 / (2 * n)  # is so cheap the conservative bound is fine
    return per


def bench_roundtrip():
    """Config 1 + north star: 512^2 RGB rect->hex->rect + 10-layer stack."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "root_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def bench_batched_filter(batch=256, size=1024):
    """Config 2: batched hex bilinear resample + Gaussian + edge filtering,
    256 images at 1024^2.

    ALL 256 images are processed inside the timed region: ``_timeit``'s
    n=16-iteration scan processes 16 DISTINCT (derived in-body) 16-image
    chunks, and its 2n differential leg covers them twice over (the full
    batch does not fit HBM as one array next to its activations, so the
    chunking is the deployment shape — but the measurement covers every
    image, no extrapolation)."""
    import hygrid_tpu as hg
    from hygrid_tpu.nn import filters

    chunk = 16
    n_chunks = batch // chunk
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((chunk, 3, size, size)), jnp.float32)

    @jax.jit
    def f(v):
        hexed = hg.rect_to_hex_resample(v, (size // 2, size // 2), "bilinear")
        blurred = filters.hex_gaussian_blur(hexed.astype(jnp.bfloat16))
        edges = filters.hex_edge_detect(blurred)
        return edges

    per_chunk = _timeit(f, x, n=n_chunks)   # 16 chunks == all 256 images
    val = chunk / per_chunk
    print(json.dumps({
        "metric": f"batched hex resample+gaussian+edge, {batch}x{size}^2 "
                  f"(all {batch} timed in {n_chunks} chunks)",
        "value": round(val, 2), "unit": "images/sec/chip",
        "vs_baseline": None}))


def bench_hexcnn(batch=256):
    """Config 3: small HexCNN classifying hex-resampled CIFAR-sized input."""
    from hygrid_tpu.models import hexcnn_small, hexify_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, 32, 32)), jnp.float32)
    model = hexcnn_small(norm="GN", dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), hexify_batch(x[:2]))

    @jax.jit
    def f(v):
        # bf16 end-to-end (production inference dtype, as in bench.py):
        # f32 inputs would run the resample in 6-pass bit-parity mode
        return model.apply(params, hexify_batch(v.astype(jnp.bfloat16)))

    per = _timeit(f, x, n=24)
    print(json.dumps({
        "metric": f"HexCNN-small inference, hex-CIFAR batch {batch}",
        "value": round(batch / per, 1), "unit": "images/sec/chip",
        "vs_baseline": None}))


def bench_hexcnn512(batch=32):
    """Metric of record (BASELINE.json): HexCNN images/sec at 512^2 inputs.

    Full pipeline per image: 512^2 RGB rect->hex resample (fused gather
    plan) -> hexcnn_small forward at 256^2 hex resolution."""
    from hygrid_tpu.models import hexcnn_small, hexify_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, 512, 512)), jnp.float32)
    model = hexcnn_small(norm="GN", dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), hexify_batch(x[:2]))

    @jax.jit
    def f(v):
        # bf16 end-to-end (production inference dtype, as in bench.py)
        return model.apply(params, hexify_batch(v.astype(jnp.bfloat16)))

    per = _timeit(f, x, n=16)
    print(json.dumps({
        "metric": f"HexCNN-small inference at 512^2 inputs, batch {batch}",
        "value": round(batch / per, 1), "unit": "images/sec/chip",
        "vs_baseline": None}))


def bench_hexunet(batch=8, size=512):
    """HexUNet dense prediction at 512^2 inputs: full pipeline rect->hex
    resample -> encoder/decoder -> per-cell logits at 256^2 hex resolution
    (VERDICT r2 item 8: the dense-prediction model families need perf
    lines)."""
    from hygrid_tpu.models import HexUNet, hexify_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, size, size)), jnp.float32)
    model = HexUNet(num_classes=4, widths=(32, 64, 128), norm="GN",
                    dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), hexify_batch(x[:1]))

    @jax.jit
    def f(v):
        return model.apply(params, hexify_batch(v.astype(jnp.bfloat16)))

    per = _timeit(f, x, n=12)
    print(json.dumps({
        "metric": f"HexUNet-small segmentation at {size}^2 inputs, "
                  f"batch {batch}",
        "value": round(batch / per, 1), "unit": "images/sec/chip",
        "vs_baseline": None}))


def bench_hexvit(batch=32, size=512):
    """HexViT classification at 512^2 inputs: rect->hex resample -> hex
    conv patch stem (4 halvings: 256^2 hex -> 16^2 = 256 tokens, the
    standard ViT token count for this scale) -> transformer encoder."""
    from hygrid_tpu.models import HexViT, hexify_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, size, size)), jnp.float32)
    model = HexViT(dim=192, depth=6, heads=3, patch_halvings=4,
                   dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), hexify_batch(x[:1]))

    @jax.jit
    def f(v):
        return model.apply(params, hexify_batch(v.astype(jnp.bfloat16)))

    per = _timeit(f, x, n=16)
    print(json.dumps({
        "metric": f"HexViT (d192/L6, 256 tokens) inference at {size}^2 "
                  f"inputs, batch {batch}",
        "value": round(batch / per, 1), "unit": "images/sec/chip",
        "vs_baseline": None}))


def _bench_train(model, metric, x, labels, n):
    """Shared body of the training-step configs: one full optimization
    step per iteration (hexify -> forward -> backward -> adamw update),
    with every new parameter reduced into the fetched scalar so the whole
    update is forced.  State is re-derived from the same base each
    iteration (standard step-time methodology; chaining states through the
    scan would serialize on the tiny param update, not change the number)."""
    from hygrid_tpu.models import (create_train_state, train_step,
                                   hexify_batch)

    state = create_train_state(model, jax.random.key(0),
                               hexify_batch(x[:1]))

    def f(v, labels):
        new_state, metrics = train_step(state, hexify_batch(v), labels)
        return new_state.params, metrics["loss"]

    per = _timeit(f, x, labels, n=n)
    print(json.dumps({
        "metric": metric, "value": round(x.shape[0] / per, 1),
        "unit": "images/sec/chip", "vs_baseline": None}))


def bench_hexcnn512_train(batch=32):
    """Training-step throughput of the 512^2 metric-of-record config:
    rect->hex resample + HexCNN-small forward + backward + adamw."""
    from hygrid_tpu.models import hexcnn_small

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, 512, 512)), jnp.float32)
    labels = jnp.asarray(np.arange(batch) % 10)
    _bench_train(hexcnn_small(norm="GN", dtype=jnp.bfloat16),
                 f"HexCNN-small TRAIN step at 512^2 inputs, batch {batch}",
                 x, labels, n=12)


def bench_hexunet_train(batch=8, size=512):
    """Training-step throughput of the dense-prediction config: rect->hex
    resample + HexUNet forward + backward + adamw on per-cell labels."""
    from hygrid_tpu.models import HexUNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, size, size)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (batch, size // 2, size // 2)))
    model = HexUNet(num_classes=4, widths=(32, 64, 128), norm="GN",
                    dtype=jnp.bfloat16)
    _bench_train(model,
                 f"HexUNet-small TRAIN step at {size}^2 inputs, batch {batch}",
                 x, labels, n=12)


def bench_resample4k():
    """>VMEM resample: 4K->4K hex->rect linear; the 33 MB/plane source
    exceeds the VMEM budget.  bf16 frames (8-bit content lossless).
    Auto-routes to the periodic-shift hybrid since round 5 (2x the
    periodic one-hot tier this config rode before — PERF.md)."""
    import hygrid_tpu as hg

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 2160, 3840)), jnp.bfloat16)
    f = jax.jit(lambda v: hg.hex_to_rect_resample(v, (2160, 3840), "linear"))
    per = _timeit(f, x, n=24)
    mpix = 2160 * 3840 / 1e6
    print(json.dumps({
        "metric": "4K->4K hex->rect resample, >VMEM tier (bf16)",
        "value": round(mpix / per, 1), "unit": "Mpix/sec/chip",
        "vs_baseline": None}))


def bench_video(frames=32):
    """Config 4: per-frame 720p rect->hex + hex filtering; target 30 fps.

    Measures DEVICE per-frame processing rate on pre-staged frames (in this
    build environment the TPU sits behind a low-bandwidth tunnel, so a
    host-streaming measurement would time the tunnel, not the chip; on a
    real TPU host the streaming path in ``models/video.py`` overlaps
    transfer with compute)."""
    from hygrid_tpu.models.video import make_frame_processor

    rng = np.random.default_rng(0)
    h, w = 720, 1280
    proc = make_frame_processor(h, w)
    frame = jnp.asarray(rng.random((3, h, w)), jnp.float32)
    per = _timeit(proc, frame, n=frames)
    fps = 1.0 / per
    print(json.dumps({
        "metric": "720p video: per-frame rect->hex + hex gaussian (device)",
        "value": round(fps, 1), "unit": "fps",
        "vs_baseline": round(fps / 30.0, 2)}))


def bench_mosaic():
    """Config 5: 4K hex-mosaic render via the fused gather plan."""
    from hygrid_tpu.viz import render_mosaic

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 540, 960)) * 255, jnp.float32)
    f = jax.jit(lambda v: render_mosaic(v, (2160, 3840)))
    per = _timeit(f, img, n=20)
    fps = 1.0 / per
    print(json.dumps({
        "metric": "4K hexagon mosaic render",
        "value": round(fps, 1), "unit": "frames/sec/chip",
        "vs_baseline": None}))


ALL = {
    "roundtrip": bench_roundtrip,
    "batched_filter": bench_batched_filter,
    "hexcnn": bench_hexcnn,
    "hexcnn512": bench_hexcnn512,
    "hexunet": bench_hexunet,
    "hexvit": bench_hexvit,
    "hexcnn512_train": bench_hexcnn512_train,
    "hexunet_train": bench_hexunet_train,
    "resample4k": bench_resample4k,
    "video": bench_video,
    "mosaic": bench_mosaic,
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(ALL)
    for n in names:
        ALL[n]()
