"""Round-4 probe G: f2b packet kernel (early exit) vs slist + e2e terrain
render with the PacketTracer plugged into the production wavefront."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []
OUT = "/root/repo/bench_records/r4_probe_g.json"


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    from tools.probe_r4b import make_populations, bench
    from vimg_tpu.scene.synthetic import terrain_scene
    from vimg_tpu.geometry.packet_trace import PacketTracer
    from vimg_tpu.geometry.cluster_trace import ClusterTracer

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    B = 1 << 17
    (pro, prd), (bro, brd), (sro, srd, sdist), minT, inf = \
        make_populations(scene, B)
    pops = (("primary", pro, prd, inf, False),
            ("bounce", bro, brd, inf, False),
            ("shadow", sro, srd, sdist, True))

    ct = ClusterTracer(scene)
    refs = {}
    for name, ro, rd, mx, ah in pops:
        refs[name] = (ct.occluded if ah else ct.closest)(
            scene, ro, rd, minT, mx)

    for variant, unroll in (("f2b", 4), ("f2b", 8), ("f2b", 16)):
        pt = PacketTracer(scene, variant=variant, unroll=unroll)
        for name, ro, rd, mx, ah in pops:
            try:
                out = bench(pt, name, f"{variant}{unroll}", ro, rd, minT,
                            mx, ah, scene)
                rc = refs[name]
                if ah:
                    agree = float(jnp.mean(out == rc))
                else:
                    agree = float(jnp.mean(
                        (out.prim_id == rc.prim_id)
                        & (jnp.isfinite(out.t) == jnp.isfinite(rc.t))))
                log(pop=name, variant=variant, unroll=unroll,
                    parity=round(agree, 6))
            except Exception as e:  # noqa: BLE001
                log(pop=name, variant=variant, unroll=unroll,
                    err=type(e).__name__ + ": " + str(e)[:300])

    # ---- e2e: production wavefront on terrain, packet vs cluster -------
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir

    st = ir.RenderSettings(width=512, height=256, spp=64, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp
    img_ref = None
    for label, tracer in (("cluster", ct),
                          ("packet_f2b8", PacketTracer(scene, variant="f2b",
                                                       unroll=8))):
        try:
            render_wavefront(scene, st, tracer=tracer)      # compile
            dt = np.inf
            for _ in range(2):
                t0 = time.time()
                img, stats = render_wavefront(scene, st, tracer=tracer,
                                              return_stats=True)
                dt = min(dt, time.time() - t0)
            mpaths = total / dt / 1e6
            mrays = (stats["segments"] + stats["shadow_rays"]) / dt / 1e6
            if img_ref is None:
                img_ref = img
                dmean = 0.0
            else:
                dmean = float(np.abs(img - img_ref).mean())
            log(e2e=label, secs=round(dt, 3), mpaths=round(mpaths, 3),
                mrays=round(mrays, 2), supersteps=stats["supersteps"],
                img_dmean=round(dmean, 6))
        except Exception as e:  # noqa: BLE001
            log(e2e=label, err=type(e).__name__ + ": " + str(e)[:300])


if __name__ == "__main__":
    main()
