"""Round-3 TPU probe batch 2: near-first ordered stack walk vs skip-link
walk in the mesh megakernel, with closest/shadow visit split.

Usage: python tools/probe_stack.py  (alone on the axon tunnel)
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
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene, terrain_scene

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scenes = {
        "terrain100k": terrain_scene(100_000, width=512, height=256),
        "bumpy100k": bumpy_sphere_scene(100_000, width=512, height=256),
    }
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 18)
    total = st.width * st.height * st.spp
    for name, scene in scenes.items():
        for walk in ("skip", "stack"):
            for rows in (32, 16):
                wbs = (1, 2) if walk == "stack" else (2,)
                for wb in wbs:
                    try:
                        img, s = render_megakernel(
                            scene, st, rows=rows, return_stats=True,
                            walk=walk, walk_batch=wb)
                        img, s = render_megakernel(
                            scene, st, rows=rows, return_stats=True,
                            walk=walk, walk_batch=wb)
                        log(probe="walk", scene=name, walk=walk, rows=rows,
                            wb=wb,
                            mpaths=round(total / s["seconds"] / 1e6, 3),
                            mrays=round((s["segments"] + s["shadow_rays"])
                                        / s["seconds"] / 1e6, 3),
                            secs=round(s["seconds"], 3),
                            nvisit=s["node_visits"],
                            nleaf=s["leaf_visits"],
                            nvisit_s=s["node_visits_shadow"],
                            nleaf_s=s["leaf_visits_shadow"],
                            mean=float(np.asarray(img).mean()))
                    except Exception as e:  # noqa: BLE001
                        log(probe="walk", scene=name, walk=walk, rows=rows,
                            wb=wb, err=type(e).__name__ + ": "
                            + str(e)[:300])
    with open("/root/repo/bench_records/r3_probe_stack.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
