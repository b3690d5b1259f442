"""Round-5 probe L: (a) the round-3 mega_500k re-run (VERDICT r4 #10 —
its compile died on a helper HTTP 500 and was never retried; now under
the persistent cache), (b) cross-scene wide-walk bake-off to decide the
ClusterTracer default (wide won terrain e2e by +2.8%, r5_probe_i).

Usage: python tools/probe_r5l.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vimg_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

RESULTS = {}
OUT = "/root/repo/bench_records/r5_probe_l.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.render import mega
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene, bumpy_sphere_scene

    print("backend:", jax.default_backend(), flush=True)

    # (a) mega_500k: the in-kernel streamed walk at 500k tris
    try:
        scene = terrain_scene(500_000, width=512, height=256)
        st = ir.RenderSettings(width=512, height=256, spp=4, max_depth=16,
                               integrator="mis")
        t0 = time.time()
        img, stats = mega.render_megakernel(scene, st, rows=32,
                                            return_stats=True)
        compile_s = time.time() - t0
        best = stats["seconds"]
        for _ in range(2):
            _, s2 = mega.render_megakernel(scene, st, rows=32,
                                           return_stats=True)
            best = min(best, s2["seconds"])
        total = 512 * 256 * 4
        RESULTS["mega500k"] = dict(
            compile_s=round(compile_s, 1), secs=round(best, 3),
            mpaths=round(total / best / 1e6, 3),
            img_finite=bool(np.isfinite(np.asarray(img)).all()))
    except Exception as e:  # record the outcome either way
        RESULTS["mega500k"] = f"{type(e).__name__}: {e}"[:300]
    print("mega500k:", RESULTS["mega500k"], flush=True)
    save()

    # (b) wide-walk bake-off
    stages = [
        ("terrain100k", terrain_scene(100_000, width=512, height=256), 64),
        ("bumpy100k", bumpy_sphere_scene(100_000, width=512, height=256),
         64),
        ("terrain500k", terrain_scene(500_000, width=512, height=256), 16),
    ]
    for name, scene, spp in stages:
        st = ir.RenderSettings(width=512, height=256, spp=spp, max_depth=64,
                               integrator="mis", batch_size=1 << 17)
        total = 512 * 256 * spp
        row = {}
        imgs = {}
        for walk in ("skip", "wide"):
            tr = ClusterTracer(scene, walk=walk)
            render_wavefront(scene, st, tracer=tr)
            best = np.inf
            for _ in range(2):
                t0 = time.time()
                img, _ = render_wavefront(scene, st, tracer=tr,
                                          return_stats=True)
                best = min(best, time.time() - t0)
            imgs[walk] = img
            row[walk] = dict(secs=round(best, 3),
                             mpaths=round(total / best / 1e6, 3))
            print(f"{name}/{walk}: {row[walk]}", flush=True)
            RESULTS[name] = row
            save()
        row["dmean"] = float(np.abs(imgs["wide"] - imgs["skip"]).mean())
        RESULTS[name] = row
        save()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
