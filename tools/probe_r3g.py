"""Round-3 TPU probe batch 11: per-row-group gated tri tests in the
ClusterTracer (one shared tile walk; each (8,128) vreg group only pays
dense tri tests for (leaf, sub-box) pairs it touches). Sweep gate on/off
x tile_rows {32, 64} on the wavefront e2e, plus the 500k streamed scene.
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
    with open("/root/repo/bench_records/r3_probe_g.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def run_wf(scene, st, total, **tr_kw):
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    tr = ClusterTracer(scene, **tr_kw)
    render_wavefront(scene, st, tracer=tr)          # compile
    best = np.inf
    stats = None
    img = None
    for _ in range(2):
        t0 = time.time()
        img, s2 = render_wavefront(scene, st, tracer=tr, return_stats=True)
        dt = time.time() - t0
        if dt < best:
            best, stats = dt, s2
    return img, best, stats


def main():
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene, terrain_scene

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp

    for name, mk in (("terrain100k", terrain_scene),
                     ("bumpy100k", bumpy_sphere_scene)):
        scene = mk(100_000, width=512, height=256)
        ref_mean = None
        for rows in (32, 64):
            for gate in (True, False):
                try:
                    img, dt, s = run_wf(scene, st, total,
                                        tile_rows=rows, group_gate=gate)
                    m = float(np.asarray(img).mean())
                    if ref_mean is None:
                        ref_mean = m
                    log(probe="group_gate", scene=name, rows=rows,
                        gate=gate, mpaths=round(total / dt / 1e6, 3),
                        secs=round(dt, 3), supersteps=s["supersteps"],
                        mean=m, dmean=abs(m - ref_mean))
                except Exception as e:  # noqa: BLE001
                    log(probe="group_gate", scene=name, rows=rows,
                        gate=gate, err=type(e).__name__ + ": "
                        + str(e)[:300])

    # streamed 500k
    scene = terrain_scene(500_000, width=512, height=256)
    st5 = ir.RenderSettings(width=512, height=256, spp=16, max_depth=64,
                            integrator="mis", batch_size=1 << 17)
    total5 = st5.width * st5.height * st5.spp
    for gate in (True, False):
        try:
            img, dt, s = run_wf(scene, st5, total5,
                                tile_rows=32, group_gate=gate)
            log(probe="group_gate", scene="terrain500k", rows=32,
                gate=gate, mpaths=round(total5 / dt / 1e6, 3),
                secs=round(dt, 3), supersteps=s["supersteps"],
                mean=float(np.asarray(img).mean()))
        except Exception as e:  # noqa: BLE001
            log(probe="group_gate", scene="terrain500k", rows=32,
                gate=gate, err=type(e).__name__ + ": " + str(e)[:300])


if __name__ == "__main__":
    main()
