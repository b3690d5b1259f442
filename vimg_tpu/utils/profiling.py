"""Profiling & observability utilities.

Replaces the reference's wall-clock phase timers and progress thread
(include/progress_print.h) with: hierarchical phase timers, jax.profiler
trace capture, and the wavefront's ray counters (render/wavefront.py).
"""
from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Hierarchical phase timing, printed like the reference's
    print_time_taken (progress_print.h:35-60)."""

    def __init__(self, quiet=False):
        self.quiet = quiet
        self.records = []

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.records.append((name, dt))
            if not self.quiet:
                print(f"[{name}] {_fmt(dt)}")


def _fmt(seconds):
    if seconds >= 60:
        return f"{int(seconds // 60)}min {seconds % 60:.1f}s"
    if seconds >= 1:
        return f"{seconds:.2f}s"
    if seconds >= 1e-3:
        return f"{seconds * 1e3:.2f}ms"
    return f"{seconds * 1e6:.0f}us"


@contextlib.contextmanager
def device_trace(log_dir="/tmp/vimg_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, warmup=1, iters=3, **kw):
    """Compile-then-time a jitted callable; returns (result, seconds)."""
    import jax
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return out, (time.time() - t0) / iters
