"""Round-4 probe E: rebuilt PacketTracer stage split (sort | cull | pack |
kernel) + kernel variants (chain prefetch, SMEM list staging, unroll)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []
OUT = "/root/repo/bench_records/r4_probe_e.json"


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
    log(n_clusters=pt.data.n_clusters, cp=pt.cp)

    for name, ro, rd, mx, ah in (("primary", pro, prd, inf, False),
                                 ("bounce", bro, brd, inf, False),
                                 ("shadow", sro, srd, sdist, True)):
        mxb = jnp.broadcast_to(mx, (B,))
        mnb = jnp.broadcast_to(minT, (B,))

        @jax.jit
        def sort_pack(ro, rd, mn, mxv):
            key = ray_sort_key(ro, rd, *pt.bounds)
            sperm = jnp.argsort(key)
            return (jnp.take(ro, sperm, axis=0),
                    jnp.take(rd, sperm, axis=0),
                    jnp.take(mn, sperm), jnp.take(mxv, sperm), sperm)

        dt_sort, (sro_, srd_, smn, smx, sperm) = timeit(
            sort_pack, ro, rd, mnb, mxb)

        cull = jax.jit(lambda a, b, c, d: _cull_meta(
            a, b, c, d, pt.cl_lo, pt.cl_hi, pt.cp))
        dt_cull, meta = timeit(cull, sro_, srd_, smn, smx)

        m = np.asarray(meta).reshape(B // WG, 8, pt.cp)
        cnt = m[:, 2, 0]

        @jax.jit
        def pack(ro, rd, mn, mxv):
            comps = jnp.concatenate(
                [ro, rd, mn[:, None], mxv[:, None]], axis=1)
            n_wg = B // WG
            return comps.reshape(n_wg, N_PACKETS, 8, 8).transpose(
                0, 2, 3, 1).reshape(n_wg * 8, 128)

        dt_pack, xt = timeit(pack, sro_, srd_, smn, smx)

        fn = _build_packet_fn(B // WG, pt.cp, 128, ah, False)
        dt_kern, _ = timeit(fn, xt, meta, pt.tri_t)

        log(pop=name, any_hit=ah,
            sort_ms=round(dt_sort * 1e3, 2),
            cull_ms=round(dt_cull * 1e3, 2),
            pack_ms=round(dt_pack * 1e3, 2),
            kernel_ms=round(dt_kern * 1e3, 2),
            kern_ns_per_ray=round(dt_kern / B * 1e9, 1),
            cand_mean=round(float(cnt.mean()), 1),
            cand_max=int(cnt.max()))


if __name__ == "__main__":
    main()
