"""Profile the cluster tracer call + one wavefront e2e superstep on TPU,
and measure the sub-AABB-gated kernel. Parses the jax.profiler trace to
attribute time: kernel vs sort vs pack vs gather/scatter vs skeleton.
Run ALONE (single TPU client)."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.render.camera import generate_rays
from vimg_tpu.scene.synthetic import bumpy_sphere_scene


def top_ops(log_dir, n=28):
    """Aggregate device op durations from the profiler trace."""
    files = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("  (no trace file found)")
        return
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    agg = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # device lanes only (XLA Ops); skip python/host threads
        name = ev.get("name", "")
        args = ev.get("args", {})
        key = args.get("long_name") or name
        if not name or name.startswith(("process_", "thread_")):
            continue
        pid = ev.get("pid", 0)
        agg.setdefault((pid, name), [0.0, 0])
        agg[(pid, name)][0] += ev["dur"]
        agg[(pid, name)][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:n]
    for (pid, name), (dur, cnt) in rows:
        print(f"  {dur/1e3:9.2f}ms x{cnt:<5d} pid={pid} {name[:90]}",
              flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    jax.block_until_ready(jax.jit(lambda a: a * 2)(jnp.arange(8.0)))

    W, H = 512, 256
    scene = bumpy_sphere_scene(100_000, width=W, height=H)
    B = W * H
    pix = np.arange(B, dtype=np.int32)
    x = (pix % W).astype(np.float32) + 0.5
    y = (H - 1 - pix // W).astype(np.float32) + 0.5
    ro, rd, _, _ = generate_rays(scene.camera, jnp.asarray(x),
                                 jnp.asarray(y), jnp.zeros(B), jnp.zeros(B))
    ro = jax.block_until_ready(ro)
    minT = jnp.full((B,), 1e-4)
    maxT = jnp.full((B,), jnp.inf)

    # sub-AABB kernel timings (vs the sweep's pre-sub numbers)
    rs = np.random.RandomState(1)
    for mode in ("origin", "off"):
        ct = ClusterTracer(scene, tile_rows=16, sort_rays=mode != "off")
        jax.block_until_ready(ct.closest(scene, ro, rd, minT, maxT).t)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(ct.closest(scene, ro, rd, minT, maxT).t)
            best = min(best, time.time() - t0)
        print(f"subAABB kernel sort={mode}: primary {best*1e3:.1f}ms "
              f"{B/best/1e6:.2f} Mrays/s", flush=True)

    ct = ClusterTracer(scene, tile_rows=16)
    # profile: 3 closest calls
    log1 = "/tmp/trace_closest"
    jax.profiler.start_trace(log1)
    for _ in range(3):
        jax.block_until_ready(ct.closest(scene, ro, rd, minT, maxT).t)
    jax.profiler.stop_trace()
    print("=== closest() x3 top ops ===", flush=True)
    top_ops(log1)

    # e2e superstep profile: small spp render
    import dataclasses
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir as _ir
    st = _ir.RenderSettings(width=W, height=H, spp=4, max_depth=8,
                            integrator="mis", batch_size=1 << 17)
    t0 = time.time()
    img = render_wavefront(scene, st, tracer=ct)
    print(f"e2e warm (spp=4): {time.time()-t0:.1f}s", flush=True)
    log2 = "/tmp/trace_e2e"
    jax.profiler.start_trace(log2)
    t0 = time.time()
    img = render_wavefront(scene, st, tracer=ct)
    dt = time.time() - t0
    jax.profiler.stop_trace()
    total = W * H * 4
    print(f"e2e (spp=4): {dt:.2f}s {total/dt/1e6:.3f} Mpaths/s", flush=True)
    print("=== e2e top ops ===", flush=True)
    top_ops(log2, n=36)


if __name__ == "__main__":
    main()
