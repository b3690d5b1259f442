"""On-chip megakernel benchmark: disney_spheres slab, tunable rows/spp.

Usage: python tools/bench_mega.py [--rows 32] [--spp 32] [--res 1800x800]
Single process only (the axon TPU tunnel is single-client).
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[32])
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--res", default="1800x800")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from vimg_tpu.render.mega import render_megakernel
    from vimg_tpu.scene.json_loader import load_json_scene

    w, h = (int(x) for x in args.res.split("x"))
    scene, st = load_json_scene("/root/reference/scenes/disney_spheres.json")
    scene = scene.replace(camera=dataclasses.replace(
        scene.camera, width=w, height=h))
    st = dataclasses.replace(st, width=w, height=h, spp=args.spp)
    total = w * h * args.spp
    print(f"backend={jax.default_backend()} {w}x{h}@{args.spp}spp "
          f"= {total/1e6:.1f}M paths", flush=True)

    for rows in args.rows:
        t0 = time.time()
        img, stats = render_megakernel(scene, st, rows=rows,
                                       return_stats=True)
        compile_and_run = time.time() - t0
        best = stats["seconds"]
        for _ in range(2):
            _, s2 = render_megakernel(scene, st, rows=rows,
                                      return_stats=True)
            best = min(best, s2["seconds"])
        rays = stats["segments"] + stats["shadow_rays"]
        print(f"rows={rows}: first(incl compile)={compile_and_run:.1f}s "
              f"best={best:.3f}s -> {total/best/1e6:.2f} Mpaths/s, "
              f"{rays/best/1e6:.1f} Mrays/s "
              f"({stats['segments']/1e6:.1f}M seg + "
              f"{stats['shadow_rays']/1e6:.1f}M shadow) "
              f"vs_baseline={total/best/12.9e6:.3f}", flush=True)
        print(f"  img mean={float(np.asarray(img).mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
