"""Streaming per-frame video path (BASELINE.json config 4: 720p/30fps).

The reference has no video pipeline; this provides the de-facto
"HexFrames video path": per-frame rect->hex resample + hex filtering as one
jitted program, with an async feeder so host->device transfer of frame t+1
overlaps device compute of frame t.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import geometry
from ..nn import filters

__all__ = ["make_frame_processor", "make_batch_processor", "process_stream",
           "StreamStats"]


def make_frame_processor(height: int, width: int,
                         hex_size: Optional[Tuple[int, int]] = None,
                         interpolation: str = "bilinear",
                         filter_taps=None,
                         post: Optional[Callable] = None,
                         compute_dtype=jnp.bfloat16):
    """Build a jitted (C, H, W) -> hex frame processor.

    Default pipeline: rect->hex at half resolution + hex Gaussian blur.
    ``post`` can append arbitrary jittable work (e.g. a HexCNN forward).

    ``compute_dtype``: video frames are 8/10-bit content, so the default
    bf16 path is lossless for the samples and runs the resample/filter
    matmuls at the full MXU rate; pass ``jnp.float32`` for bit-parity with
    the geometry goldens (the resample then runs 6-pass f32, ~2x slower).
    """
    if hex_size is None:
        hex_size = (height // 2, width // 2)
    if filter_taps is None:
        filter_taps = filters.hex_gaussian_kernel(1.0)

    @jax.jit
    def process(frame):
        frame = frame.astype(compute_dtype)
        hexed = geometry.rect_to_hex_resample(frame[None], hex_size,
                                              interpolation)
        out = filters.hex_filter(hexed, filter_taps)
        if post is not None:
            out = post(out)
        return out[0]

    return process


class StreamStats:
    def __init__(self):
        self.frames = 0
        self.seconds = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.seconds if self.seconds else float("inf")


def make_batch_processor(height: int, width: int,
                         hex_size: Optional[Tuple[int, int]] = None,
                         interpolation: str = "bilinear",
                         filter_taps=None,
                         post: Optional[Callable] = None,
                         compute_dtype=jnp.bfloat16):
    """Batched variant of :func:`make_frame_processor`: (B, C, H, W) in,
    processed hex frames out.  Use with ``process_stream(microbatch=k)`` to
    amortise per-dispatch latency (essential over high-latency device
    links).  ``compute_dtype`` follows the per-frame processor's policy so
    microbatched and per-frame results agree bit-for-bit."""
    if hex_size is None:
        hex_size = (height // 2, width // 2)
    if filter_taps is None:
        filter_taps = filters.hex_gaussian_kernel(1.0)

    @jax.jit
    def process(batch):
        batch = batch.astype(compute_dtype)
        hexed = geometry.rect_to_hex_resample(batch, hex_size, interpolation)
        out = filters.hex_filter(hexed, filter_taps)
        if post is not None:
            out = post(out)
        return out

    return process


def process_stream(frames: Iterable[np.ndarray], processor,
                   stats: Optional[StreamStats] = None,
                   depth: int = 8, microbatch: int = 1) -> Iterator:
    """Run the processor over a frame iterable with ``depth`` frames of
    device pipelining: dispatch is async, so keeping several results in
    flight hides per-frame host<->device round-trip latency (essential over
    high-latency links) while preserving frame order."""
    from collections import deque
    stats = stats if stats is not None else StreamStats()
    t0 = time.perf_counter()
    pending: deque = deque()
    n = 0

    def drain_one():
        item = pending.popleft()
        out = jax.block_until_ready(item)
        if microbatch > 1:
            yield from out
        else:
            yield out

    if microbatch > 1:
        buf = []
        for frame in frames:
            buf.append(np.asarray(frame))
            n += 1
            if len(buf) == microbatch:
                pending.append(processor(jnp.asarray(np.stack(buf))))
                buf = []
                if len(pending) > depth:
                    yield from drain_one()
        if buf:
            pending.append(processor(jnp.asarray(np.stack(buf))))
    else:
        for frame in frames:
            pending.append(processor(jnp.asarray(frame)))
            n += 1
            if len(pending) > depth:
                yield from drain_one()
    while pending:
        yield from drain_one()
    stats.frames = n
    stats.seconds = time.perf_counter() - t0
