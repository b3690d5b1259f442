"""Round-4 probe H: interleaved-walk cluster kernel sweep.

walks=N partitions each block's row groups into N independent tree walks
whose scalar decision chains interleave — latency hiding for the
~3.3 us/visit serialization (r3_probe_h)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []
OUT = "/root/repo/bench_records/r4_probe_h.json"


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from tools.probe_r4b import make_populations
    from vimg_tpu.scene.synthetic import terrain_scene
    from vimg_tpu.geometry.cluster_trace import ClusterTracer

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    B = 1 << 17
    (pro, prd), (bro, brd), (sro, srd, sdist), minT, inf = \
        make_populations(scene, B)
    pops = (("primary", pro, prd, inf, False),
            ("bounce", bro, brd, inf, False),
            ("shadow", sro, srd, sdist, True))

    ref = {}
    for rows, walks in ((64, 1), (64, 2), (128, 2), (128, 4), (32, 2)):
        try:
            tr = ClusterTracer(scene, tile_rows=rows, walks=walks)
        except Exception as e:  # noqa: BLE001
            log(rows=rows, walks=walks,
                err=type(e).__name__ + ": " + str(e)[:200])
            continue
        for name, ro, rd, mx, ah in pops:
            try:
                f = tr.occluded if ah else tr.closest
                out = f(scene, ro, rd, minT, mx)
                jax.block_until_ready(out)
                t0 = time.time()
                for _ in range(5):
                    out = f(scene, ro, rd, minT, mx)
                    jax.block_until_ready(out)
                dt = (time.time() - t0) / 5
                if name not in ref:
                    ref[name] = out
                    par = 1.0
                elif ah:
                    par = float(jnp.mean(out == ref[name]))
                else:
                    par = float(jnp.mean(
                        (out.prim_id == ref[name].prim_id)
                        & (out.t == ref[name].t)))
                log(rows=rows, walks=walks, pop=name,
                    ns_per_ray=round(dt / B * 1e9, 1),
                    parity=round(par, 6))
            except Exception as e:  # noqa: BLE001
                log(rows=rows, walks=walks, pop=name,
                    err=type(e).__name__ + ": " + str(e)[:250])


if __name__ == "__main__":
    main()
