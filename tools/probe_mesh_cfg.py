"""Mesh megakernel config sweep on-chip: cluster size K x pixel-tile
width. K trades tree size (fewer, fatter leaves) against wasted dense
tri tests in the block-union walk; TILE_W shapes the block's ray frustum
(at rows=32, P=4096: 64 -> 64x64 tiles, 128 -> 128x32, 32 -> 32x128).

Monkeypatches the module constants and clears the pack/compile caches
between configs — bench-only tool, production keeps the committed
defaults.

Usage: python tools/probe_mesh_cfg.py   (owns the TPU tunnel)
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: F401
import numpy as np

from vimg_tpu.render.mega import kernel as K
from vimg_tpu.scene import ir
from vimg_tpu.scene.synthetic import bumpy_sphere_scene

OUT = "/tmp/probe_mesh_cfg.json"
RESULTS = {}

CONFIGS = [
    (64, 64),     # committed default
    (32, 64),
    (128, 64),
    (64, 128),
    (64, 32),
    (32, 128),
]


def main(T=100_000, spp=16, W=512, H=256):
    st = ir.RenderSettings(width=W, height=H, spp=spp, max_depth=16,
                           integrator="mis")
    total = W * H * spp
    for k, tw in CONFIGS:
        K.MESH_CLUSTER_K = k
        K.TILE_W = tw
        K._PACK_CACHE.clear()
        K._MEGA_CACHE.clear()
        K._build_renderer.cache_clear()
        scene = bumpy_sphere_scene(T, width=W, height=H)
        t0 = time.time()
        img, stats = K.render_megakernel(scene, st, rows=32,
                                         return_stats=True, walk_batch=2)
        first = time.time() - t0
        best = stats["seconds"]
        for _ in range(2):
            _, s2 = K.render_megakernel(scene, st, rows=32,
                                        return_stats=True, walk_batch=2)
            best = min(best, s2["seconds"])
        rays = stats["segments"] + stats["shadow_rays"]
        key = f"K{k}_tw{tw}"
        RESULTS[key] = dict(
            first_s=round(first, 1), best_s=round(best, 3),
            mpaths=round(total / best / 1e6, 3),
            mrays=round(rays / best / 1e6, 3),
            visits=stats["node_visits"], leaves=stats["leaf_visits"],
            img_mean=float(np.asarray(img).mean()))
        print(f"{key}: first={first:.1f}s best={best:.3f}s "
              f"{total/best/1e6:.3f} Mpaths/s {rays/best/1e6:.3f} Mrays/s "
              f"visits={stats['node_visits']:.0f} "
              f"leaves={stats['leaf_visits']:.0f} "
              f"mean={RESULTS[key]['img_mean']:.5f}", flush=True)
        with open(OUT, "w") as f:
            json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
