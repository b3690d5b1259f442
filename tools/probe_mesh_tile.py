"""TPU sweep: tiled pixel blocks x cluster size for the mesh megakernel.

Stage 1: rows x K sweep at spp=16 on the 100k-tri synthetic scene.
Run ALONE (single TPU client).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import vimg_tpu.render.mega.kernel as K
from vimg_tpu.render.mega import render_megakernel, supports_megakernel
from vimg_tpu.scene import ir
from vimg_tpu.scene.synthetic import bumpy_sphere_scene


def main():
    print("backend:", jax.default_backend(), flush=True)
    W, H = 512, 256
    scene = bumpy_sphere_scene(100_000, width=W, height=H)
    spp = 16
    st = ir.RenderSettings(width=W, height=H, spp=spp, max_depth=16,
                           integrator="mis")
    assert supports_megakernel(scene, st)
    for ck in (64, 128):
        K.MESH_CLUSTER_K = ck
        K._PACK_CACHE.clear()  # repack with the new cluster size
        for rows in (16, 32):
            try:
                t0 = time.time()
                img, stats = render_megakernel(scene, st, rows=rows,
                                               return_stats=True)
                first = time.time() - t0
                best = stats["seconds"]
                for _ in range(2):
                    _, s2 = render_megakernel(scene, st, rows=rows,
                                              return_stats=True)
                    best = min(best, s2["seconds"])
            except Exception as e:  # noqa: BLE001
                print(f"K={ck} rows={rows}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            total = W * H * spp
            rays = stats["segments"] + stats["shadow_rays"]
            nv, nl = stats["node_visits"], stats["leaf_visits"]
            print(f"K={ck} rows={rows}: first={first:.1f}s best={best:.3f}s "
                  f"{total/best/1e6:.3f} Mpaths/s {rays/best/1e6:.2f} "
                  f"Mrays/s mean={np.asarray(img).mean():.5f}", flush=True)
            print(f"   visits={nv:.0f} leaves={nl:.0f} "
                  f"us/visit={best*1e6/max(nv,1):.2f} "
                  f"leaf_frac={nl/max(nv,1):.2f}", flush=True)


if __name__ == "__main__":
    main()
