"""Round-3 TPU probe batch 9: confirmation runs with the new defaults.

1. terrain/bumpy 100k megakernel with defer/rows16/wb4 at K in {32, 64}.
2. streamed 500k terrain with the new defaults.
3. env-lit textured terrain (lego/statues class) via the cached wavefront
   + ClusterTracer: warm e2e Mpaths/s (round-2 reference point: 0.067 on
   plain mesh, ~0 for env/tex which had no fast path at all).
4. bench.py's two stages end to end.
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
    import vimg_tpu.render.mega.kernel as mk
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import (bumpy_sphere_scene, terrain_scene,
                                          textured_terrain_scene)

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 18)
    total = st.width * st.height * st.spp

    for K in (64, 32):
        mk.MESH_CLUSTER_K = K
        mk._PACK_CACHE.clear()
        for name, mkscene in (("terrain100k", terrain_scene),
                              ("bumpy100k", bumpy_sphere_scene)):
            scene = mkscene(100_000, width=512, height=256)
            try:
                img, s = render_megakernel(scene, st, return_stats=True)
                img, s = render_megakernel(scene, st, return_stats=True)
                log(probe="mega_defaults", scene=name, K=K,
                    mpaths=round(total / s["seconds"] / 1e6, 3),
                    mrays=round((s["segments"] + s["shadow_rays"])
                                / s["seconds"] / 1e6, 3),
                    secs=round(s["seconds"], 3),
                    mean=float(np.asarray(img).mean()))
            except Exception as e:  # noqa: BLE001
                log(probe="mega_defaults", scene=name, K=K,
                    err=type(e).__name__ + ": " + str(e)[:200])
    mk.MESH_CLUSTER_K = 64
    mk._PACK_CACHE.clear()

    # streamed 500k tris
    try:
        scene = terrain_scene(500_000, width=512, height=256)
        st5 = ir.RenderSettings(width=512, height=256, spp=8, max_depth=64,
                                integrator="mis", batch_size=1 << 18)
        tot5 = st5.width * st5.height * st5.spp
        img, s = render_megakernel(scene, st5, return_stats=True)
        img, s = render_megakernel(scene, st5, return_stats=True)
        log(probe="mega_500k", scene="terrain500k",
            mpaths=round(tot5 / s["seconds"] / 1e6, 3),
            mrays=round((s["segments"] + s["shadow_rays"])
                        / s["seconds"] / 1e6, 3),
            secs=round(s["seconds"], 3))
    except Exception as e:  # noqa: BLE001
        log(probe="mega_500k", err=type(e).__name__ + ": " + str(e)[:300])

    # env + textured mesh via the cached wavefront
    try:
        scene = textured_terrain_scene(100_000, width=512, height=256)
        st2 = ir.RenderSettings(width=512, height=256, spp=16, max_depth=64,
                                integrator="mis", batch_size=1 << 17)
        tot2 = st2.width * st2.height * st2.spp
        tr = ClusterTracer(scene)
        img, stats = render_wavefront(scene, st2, tracer=tr,
                                      return_stats=True)
        t0 = time.time()
        img, stats = render_wavefront(scene, st2, tracer=tr,
                                      return_stats=True)
        dt = time.time() - t0
        log(probe="envtex_wavefront", scene="textured_terrain100k",
            mpaths=round(tot2 / dt / 1e6, 4), secs=round(dt, 3),
            supersteps=stats["supersteps"],
            mean=float(np.asarray(img).mean()))
        np.save("/root/repo/bench_records/r3_envtex_img.npy",
                np.asarray(img))
    except Exception as e:  # noqa: BLE001
        log(probe="envtex_wavefront",
            err=type(e).__name__ + ": " + str(e)[:300])

    with open("/root/repo/bench_records/r3_probe_e.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
