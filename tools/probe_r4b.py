"""Round-4 TPU probe B: PacketTracer vs ClusterTracer per-population cost.

Same harness as probe_r3h: terrain 100k, primary/bounce/shadow ray
populations at wavefront batch size (131072).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []
OUT = "/root/repo/bench_records/r4_probe_b.json"


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_populations(scene, B):
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.integrators import _primary_rays
    from vimg_tpu.scene import ir

    st = ir.RenderSettings(width=512, height=256, spp=8, max_depth=8,
                           integrator="mis")
    rs = np.random.RandomState(7)
    pix = jnp.asarray(rs.randint(0, 512 * 256, B), jnp.int32)
    samp = jnp.asarray(rs.randint(0, 8, B), jnp.int32)
    ro, rd, _, _ = _primary_rays(scene, st, pix, samp)
    minT = jnp.full((B,), 1e-3)
    inf = jnp.full((B,), jnp.inf)

    tr = ClusterTracer(scene)
    hr = tr.closest(scene, ro, rd, minT, inf)
    t = jnp.where(jnp.isfinite(hr.t), hr.t, 1.0)
    p = ro + rd * t[:, None]
    d = jnp.asarray(rs.randn(B, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    flip = jnp.sum(d * rd, axis=1) > 0
    d = jnp.where(flip[:, None], -d, d)
    bounce = (p + d * 1e-3, d)
    lp = jnp.asarray(scene.verts.mean(0) + np.array([0, 6, 0]), jnp.float32)
    wi = lp[None, :] - p
    dist = jnp.linalg.norm(wi, axis=1, keepdims=True)
    shadow = (p + wi / dist * 1e-3, wi / dist, dist[:, 0] - 1e-2)
    return (ro, rd), bounce, shadow, minT, inf


def bench(tr, name, tracer_name, ro, rd, minT, maxT, any_hit, scene, **kw):
    f = tr.occluded if any_hit else tr.closest
    out = f(scene, ro, rd, minT, maxT)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = f(scene, ro, rd, minT, maxT)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    B = ro.shape[0]
    log(pop=name, tracer=tracer_name, any_hit=any_hit, secs=round(dt, 4),
        ns_per_ray=round(dt / B * 1e9, 1), **kw)
    return out


def main():
    from vimg_tpu.scene.synthetic import terrain_scene
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.geometry.packet_trace import PacketTracer

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    B = 1 << 17
    (pro, prd), (bro, brd), (sro, srd, sdist), minT, inf = \
        make_populations(scene, B)

    pops = (("primary", pro, prd, inf, False),
            ("bounce", bro, brd, inf, False),
            ("shadow", sro, srd, sdist, True))

    ct = ClusterTracer(scene)
    for name, ro, rd, mx, ah in pops:
        try:
            bench(ct, name, "cluster", ro, rd, minT, mx, ah, scene)
        except Exception as e:  # noqa: BLE001
            log(pop=name, tracer="cluster",
                err=type(e).__name__ + ": " + str(e)[:250])

    for max_k in (128, 64):
        try:
            pt = PacketTracer(scene, max_k=max_k)
            log(tracer="packet", max_k=max_k,
                n_clusters=pt.data.n_clusters)
        except Exception as e:  # noqa: BLE001
            log(tracer="packet", max_k=max_k,
                err=type(e).__name__ + ": " + str(e)[:300])
            continue
        for name, ro, rd, mx, ah in pops:
            try:
                out_p = bench(pt, name, "packet", ro, rd, minT, mx, ah,
                              scene, max_k=max_k)
                out_c = (ct.occluded if ah else ct.closest)(
                    scene, ro, rd, minT, mx)
                if ah:
                    agree = float(jnp.mean(out_p == out_c))
                else:
                    agree = float(jnp.mean(
                        (out_p.prim_id == out_c.prim_id)
                        & (jnp.isfinite(out_p.t) == jnp.isfinite(out_c.t))))
                log(pop=name, max_k=max_k, parity=round(agree, 6))
            except Exception as e:  # noqa: BLE001
                log(pop=name, tracer="packet", max_k=max_k,
                    err=type(e).__name__ + ": " + str(e)[:300])


if __name__ == "__main__":
    main()
