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


VPU_F32_FLOPS = 428e9   # measured in-kernel FMA peak on v5e
                        # (bench_records/r2_probe_vpu_bf16.log)


def walk_roofline(stats, seconds, rows, max_k=64):
    """Roofline accounting for a mesh megakernel render: how much of the
    measured VPU f32 peak the traversal's vector work achieved, and the
    per-ray work amplification vs an ideal per-ray traversal.

    ``stats`` is render_megakernel(return_stats=True)'s dict. The model
    charges ~25 flops per (lane, tri) test and ~30 per (lane, node) slab;
    'useful' assumes ~30 tri tests + 60 box tests per ray (the reference
    CPU walk's per-ray work, include/bvh.h:87-226)."""
    lanes = rows * 128
    leafs = stats.get("leaf_visits", 0.0) + stats.get(
        "leaf_visits_shadow", 0.0)
    visits = stats.get("node_visits", 0.0) + stats.get(
        "node_visits_shadow", 0.0)
    rays = stats.get("segments", 0.0) + stats.get("shadow_rays", 0.0)
    tri_flops = leafs * max_k * 25.0 * lanes
    box_flops = visits * 30.0 * lanes
    total = tri_flops + box_flops
    useful = rays * (30 * 25.0 + 60 * 30.0)
    return dict(
        rays_per_s=rays / max(seconds, 1e-9),
        vector_flops=total,
        vpu_utilization=total / max(seconds, 1e-9) / VPU_F32_FLOPS,
        work_amplification=total / max(useful, 1.0),
        tri_tests_per_ray=leafs * max_k * lanes / max(rays, 1.0),
    )
