"""Round-3 TPU probe batch 6: deferred-liveness walk vs skip/stack,
rows x walk_batch x cluster-K sweep on the 100k-tri scenes.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import vimg_tpu.render.mega.kernel as mk
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene, terrain_scene

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 18)
    total = st.width * st.height * st.spp

    scenes = {
        "terrain100k": terrain_scene(100_000, width=512, height=256),
        "bumpy100k": bumpy_sphere_scene(100_000, width=512, height=256),
    }
    # main sweep at K=64
    for name, scene in scenes.items():
        for walk in ("defer",):
            for rows in (32, 16, 8):
                for wb in (1, 2, 4):
                    try:
                        img, s = render_megakernel(
                            scene, st, rows=rows, return_stats=True,
                            walk=walk, walk_batch=wb)
                        img, s = render_megakernel(
                            scene, st, rows=rows, return_stats=True,
                            walk=walk, walk_batch=wb)
                        log(scene=name, walk=walk, rows=rows, wb=wb, K=64,
                            mpaths=round(total / s["seconds"] / 1e6, 3),
                            secs=round(s["seconds"], 3),
                            nvisit=s["node_visits"],
                            nleaf=s["leaf_visits"],
                            nvisit_s=s["node_visits_shadow"],
                            nleaf_s=s["leaf_visits_shadow"],
                            mean=float(np.asarray(img).mean()))
                    except Exception as e:  # noqa: BLE001
                        log(scene=name, walk=walk, rows=rows, wb=wb, K=64,
                            err=type(e).__name__ + ": " + str(e)[:200])
    # K sweep on terrain with the best (rows, wb) so far
    best = min((r for r in RESULTS if "secs" in r
                and r["scene"] == "terrain100k"), key=lambda r: r["secs"])
    log(note="best K=64 config", **{k: best[k] for k in
                                    ("rows", "wb", "secs", "mpaths")})
    for K in (32, 128):
        mk.MESH_CLUSTER_K = K
        mk._PACK_CACHE.clear()
        scene = terrain_scene(100_000, width=512, height=256)
        try:
            img, s = render_megakernel(scene, st, rows=best["rows"],
                                       return_stats=True, walk="defer",
                                       walk_batch=best["wb"])
            img, s = render_megakernel(scene, st, rows=best["rows"],
                                       return_stats=True, walk="defer",
                                       walk_batch=best["wb"])
            log(scene="terrain100k", walk="defer", rows=best["rows"],
                wb=best["wb"], K=K,
                mpaths=round(total / s["seconds"] / 1e6, 3),
                secs=round(s["seconds"], 3),
                nvisit=s["node_visits"], nleaf=s["leaf_visits"],
                mean=float(np.asarray(img).mean()))
        except Exception as e:  # noqa: BLE001
            log(scene="terrain100k", K=K,
                err=type(e).__name__ + ": " + str(e)[:200])
    mk.MESH_CLUSTER_K = 64

    with open("/root/repo/bench_records/r3_probe_defer.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
