"""Tracing / profiling helpers (SURVEY.md section 5: absent upstream).

The reference has no tracing story (stray commented prints only,
``geometry.py:87``); here the resample/conv entry points can be annotated
with ``jax.profiler`` trace contexts and timed against device completion.
"""
from __future__ import annotations

import contextlib
import functools
import logging
import time
from typing import Callable, Optional

import jax

__all__ = ["annotate", "device_timer", "Timer", "get_logger"]

_LOGGER = logging.getLogger("hygrid_tpu")


def get_logger() -> logging.Logger:
    """Framework logger (std logging; the reference globally suppresses all
    warnings instead — ``geometry_np.py:5`` etc. — we do not)."""
    return _LOGGER


def annotate(name: Optional[str] = None) -> Callable:
    """Decorator: wrap a fn in a ``jax.profiler.TraceAnnotation`` so it shows
    up named in TPU profiles."""
    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(label):
                return fn(*args, **kwargs)
        return wrapper
    return deco


@contextlib.contextmanager
def device_timer(label: str = "", logger: Optional[logging.Logger] = None):
    """Context manager timing until device completion of the result placed
    in ``timer.result``::

        with device_timer("resample") as t:
            t.result = hexresize(img, (512, 512))
    """
    t = Timer(label)
    t0 = time.perf_counter()
    yield t
    if t.result is not None:
        jax.block_until_ready(t.result)
    t.elapsed = time.perf_counter() - t0
    (logger or _LOGGER).debug("%s: %.3f ms", label, t.elapsed * 1e3)


class Timer:
    def __init__(self, label: str = ""):
        self.label = label
        self.result = None
        self.elapsed: float = float("nan")


def benchmark(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median-free simple wall benchmark with device sync; returns ms."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3
