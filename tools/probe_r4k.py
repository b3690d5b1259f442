"""Round-4 probe K: megakernel material-count slope on the mesh walk.

Measures the per-bounce select-chain cost at glTF-scale n_mats (the
MEGA_MAX_MATERIALS=256 gate): terrain-100k mesh megakernel at 1 vs 128
materials, plus the wavefront reference at 128.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

RESULTS = []
OUT = "/root/repo/bench_records/r4_many_mats.json"


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from vimg_tpu.render.mega import render_megakernel
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import (multi_material_terrain_scene,
                                          terrain_scene)

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    st = ir.RenderSettings(width=512, height=256, spp=16, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp

    imgs = {}
    for label, scene in (
            ("mega_1mat", terrain_scene(100_000, width=512, height=256)),
            ("mega_128mat", multi_material_terrain_scene(
                100_000, 128, width=512, height=256))):
        try:
            t0 = time.time()
            render_megakernel(scene, st, rows=16, walk_batch=4,
                              walk="defer")
            compile_s = time.time() - t0
            dt = np.inf
            for _ in range(2):
                t0 = time.time()
                img = render_megakernel(scene, st, rows=16, walk_batch=4,
                                        walk="defer")
                np.asarray(img)
                dt = min(dt, time.time() - t0)
            imgs[label] = img
            log(label=label, n_mats=scene.n_mats(),
                compile_s=round(compile_s, 1), secs=round(dt, 3),
                mpaths=round(total / dt / 1e6, 3))
        except Exception as e:  # noqa: BLE001
            log(label=label, err=type(e).__name__ + ": " + str(e)[:300])

    # wavefront reference at 128 mats (the >48 route before this round)
    try:
        scene = multi_material_terrain_scene(100_000, 128,
                                             width=512, height=256)
        tr = ClusterTracer(scene)
        render_wavefront(scene, st, tracer=tr)
        t0 = time.time()
        img = render_wavefront(scene, st, tracer=tr)
        dt = time.time() - t0
        d = float(np.abs(img - imgs.get("mega_128mat", img)).mean())
        log(label="wavefront_128mat", secs=round(dt, 3),
            mpaths=round(total / dt / 1e6, 3), img_dmean_vs_mega=round(d, 7))
    except Exception as e:  # noqa: BLE001
        log(label="wavefront_128mat",
            err=type(e).__name__ + ": " + str(e)[:300])


if __name__ == "__main__":
    main()
