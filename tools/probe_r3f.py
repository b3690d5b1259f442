"""Round-3 TPU probe batch 10: wavefront vs megakernel at production spp
on mesh scenes (the cached wavefront refills to 100% occupancy with
global Morton sorting — it may beat the pixel-tile megakernel), plus a
defer wb=8 check and bench.py stages.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene, terrain_scene

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp

    for name, mkscene in (("terrain100k", terrain_scene),
                          ("bumpy100k", bumpy_sphere_scene)):
        scene = mkscene(100_000, width=512, height=256)
        for tile_rows in (32, 16):
            try:
                tr = ClusterTracer(scene, tile_rows=tile_rows)
                img, stats = render_wavefront(scene, st, tracer=tr,
                                              return_stats=True)
                t0 = time.time()
                img, stats = render_wavefront(scene, st, tracer=tr,
                                              return_stats=True)
                dt = time.time() - t0
                log(probe="wavefront32", scene=name, tile_rows=tile_rows,
                    mpaths=round(total / dt / 1e6, 3), secs=round(dt, 3),
                    supersteps=stats["supersteps"],
                    mean=float(np.asarray(img).mean()))
            except Exception as e:  # noqa: BLE001
                log(probe="wavefront32", scene=name, tile_rows=tile_rows,
                    err=type(e).__name__ + ": " + str(e)[:200])
        try:
            img, s = render_megakernel(scene, st, return_stats=True,
                                       walk_batch=8)
            img, s = render_megakernel(scene, st, return_stats=True,
                                       walk_batch=8)
            log(probe="mega_wb8", scene=name,
                mpaths=round(total / s["seconds"] / 1e6, 3),
                secs=round(s["seconds"], 3))
        except Exception as e:  # noqa: BLE001
            log(probe="mega_wb8", scene=name,
                err=type(e).__name__ + ": " + str(e)[:200])

    with open("/root/repo/bench_records/r3_probe_f.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
