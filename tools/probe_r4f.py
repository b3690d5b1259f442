"""Round-4 probe F: packet-kernel variant sweep (chase | prefetch | slist
x unroll) on the terrain populations."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []
OUT = "/root/repo/bench_records/r4_probe_f2.json"


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
    from tools.probe_r4b import make_populations
    from vimg_tpu.scene.synthetic import terrain_scene
    from vimg_tpu.geometry.packet_trace import (
        PacketTracer, _cull_meta, _build_packet_fn, WG, N_PACKETS)
    from vimg_tpu.geometry.cluster_trace import ray_sort_key

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    B = 1 << 17
    (pro, prd), (bro, brd), (sro, srd, sdist), minT, inf = \
        make_populations(scene, B)

    pt = PacketTracer(scene)

    for name, ro, rd, mx, ah in (("primary", pro, prd, inf, False),
                                 ("bounce", bro, brd, inf, False),
                                 ("shadow", sro, srd, sdist, True)):
        mxb = jnp.broadcast_to(mx, (B,))
        mnb = jnp.broadcast_to(minT, (B,))

        @jax.jit
        def prep(ro, rd, mn, mxv):
            key = ray_sort_key(ro, rd, *pt.bounds)
            sperm = jnp.argsort(key)
            sro_ = jnp.take(ro, sperm, axis=0)
            srd_ = jnp.take(rd, sperm, axis=0)
            smn = jnp.take(mn, sperm)
            smx = jnp.take(mxv, sperm)
            meta = _cull_meta(sro_, srd_, smn, smx, pt.cl_lo, pt.cl_hi,
                              pt.cp)
            comps = jnp.concatenate(
                [sro_, srd_, smn[:, None], smx[:, None]], axis=1)
            n_wg = B // WG
            xt = comps.reshape(n_wg, N_PACKETS, 8, 8).transpose(
                0, 2, 3, 1).reshape(n_wg * 8, 128)
            return xt, meta

        _, (xt, meta) = timeit(prep, ro, rd, mnb, mxb, iters=1)

        ref = None
        for variant, unroll in (("chase", 1), ("prefetch", 1),
                                ("slist", 1), ("slist", 2), ("slist", 4)):
            try:
                fn = _build_packet_fn(B // WG, pt.cp, pt.data.n_clusters,
                                      ah, False, variant, unroll)
                dt, out = timeit(fn, xt, meta, pt.tri_t)
                if ref is None:
                    ref = out
                    par = 1.0
                else:
                    par = float(jnp.mean(out == ref))
                log(pop=name, variant=variant, unroll=unroll,
                    kernel_ms=round(dt * 1e3, 2),
                    ns_per_ray=round(dt / B * 1e9, 1), parity=round(par, 6))
            except Exception as e:  # noqa: BLE001
                log(pop=name, variant=variant, unroll=unroll,
                    err=type(e).__name__ + ": " + str(e)[:200])


if __name__ == "__main__":
    main()
