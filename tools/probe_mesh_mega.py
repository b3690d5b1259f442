"""Mesh megakernel on TPU: compile check + throughput on the synthetic
100k-tri scene (the glb-config analogue). Run ALONE (single TPU client).

Prints the traversal decomposition (node visits / leaf visits per walk)
so per-visit cost can be derived: time ~= visits * per_visit_cost.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from vimg_tpu.render.mega import render_megakernel, supports_megakernel
from vimg_tpu.scene import ir
from vimg_tpu.scene.synthetic import bumpy_sphere_scene


def main():
    print("backend:", jax.default_backend(), flush=True)
    W, H = 512, 256
    scene = bumpy_sphere_scene(100_000, width=W, height=H)
    for spp in (16,):
        st = ir.RenderSettings(width=W, height=H, spp=spp, max_depth=16,
                               integrator="mis")
        assert supports_megakernel(scene, st)
        for rows in (16, 32):
            t0 = time.time()
            img, stats = render_megakernel(scene, st, rows=rows,
                                           return_stats=True)
            first = time.time() - t0
            best = stats["seconds"]
            for _ in range(2):
                _, s2 = render_megakernel(scene, st, rows=rows,
                                          return_stats=True)
                best = min(best, s2["seconds"])
            total = W * H * spp
            rays = stats["segments"] + stats["shadow_rays"]
            nv, nl = stats["node_visits"], stats["leaf_visits"]
            print(f"mesh-mega spp={spp} rows={rows}: first={first:.1f}s "
                  f"best={best:.3f}s {total/best/1e6:.3f} Mpaths/s "
                  f"{rays/best/1e6:.2f} Mrays/s "
                  f"mean={np.asarray(img).mean():.5f}", flush=True)
            print(f"   visits={nv:.0f} leaves={nl:.0f} "
                  f"visits/ray={nv*rows*128/max(rays,1):.1f} "
                  f"us/visit={best*1e6/max(nv,1):.2f} "
                  f"leaf_frac={nl/max(nv,1):.2f}", flush=True)


if __name__ == "__main__":
    main()
