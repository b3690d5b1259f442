"""Device-op-level profile of one wavefront+cluster mesh superstep: where
do the ~500 ms/superstep go? Run ALONE (single TPU client)."""
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
from vimg_tpu.scene.synthetic import bumpy_sphere_scene


def device_ops(log_dir, n=30):
    files = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("  (no trace file found)")
        return
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    # find device-lane pids: process_name metadata containing 'TPU' / 'Chip'
    pidname = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pidname[ev.get("pid")] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, nm in pidname.items()
                if ("TPU" in nm or "Chip" in nm or "/device" in nm)}
    print("  processes:", sorted(pidname.items())[:12])
    agg = {}
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += ev["dur"]
        agg[name][1] += 1
        total += ev["dur"]
    print(f"  total device time: {total/1e3:.1f} ms")
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:n]:
        print(f"  {dur/1e3:9.2f}ms x{cnt:<6d} {name[:110]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir as _ir
    W, H = 256, 128
    scene = bumpy_sphere_scene(100_000, width=W, height=H)
    ct = ClusterTracer(scene, tile_rows=16)
    st = _ir.RenderSettings(width=W, height=H, spp=4, max_depth=8,
                            integrator="mis", batch_size=1 << 15)
    img = render_wavefront(scene, st, tracer=ct)   # warm/compile
    log = "/tmp/trace_e2e_ops"
    jax.profiler.start_trace(log)
    t0 = time.time()
    img, stats = render_wavefront(scene, st, tracer=ct, return_stats=True)
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"e2e: {dt:.2f}s, {stats['supersteps']} supersteps "
          f"-> {dt/max(stats['supersteps'],1)*1e3:.0f} ms/superstep",
          flush=True)
    device_ops(log)


if __name__ == "__main__":
    main()
