"""Round-3 TPU probe batch 3.

1. Wavefront mesh e2e with the dead-lane maxT=-inf fix (terrain/bumpy).
2. Sync microbench: what does a vector->scalar any() cost when consumed
   by (a) scalar arithmetic, (b) lax.cond, (c) 8 independent anys batched
   -> is the 0.57us/visit reducible by deferring/batching decisions?
3. ClusterTracer standalone on real bounce-like batches: sorted vs
   unsorted, origin vs dir keys, tile_rows {8,16,32} + per-tile stats ->
   does global rebinning beat pixel-tile unions, and how do unions scale
   with tile size?
4. argsort + take cost at 131k (the rebinning tax).
5. Megakernel terrain at rows {8,4} (sync-wall scaling curve).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def microbench_sync():
    ROWS = 32
    SHAPE = (ROWS, 128)
    N = 20000

    def mk(mode):
        def kernel(x_ref, o_ref):
            x0 = x_ref[:]

            def body(i, carry):
                x, n = carry
                x = x * 1.0000001 + 1e-9
                if mode == "scalar":
                    a = jnp.any(x > 0.5)
                    n = n + jnp.where(a, 1.0, 0.0)
                elif mode == "cond":
                    a = jnp.any(x > 0.5)
                    n = jax.lax.cond(a, lambda v: v + 1.0,
                                     lambda v: v, n)
                elif mode == "any8":
                    acc = 0.0
                    for k in range(8):
                        acc = acc + jnp.where(
                            jnp.any(x > 0.5 + 0.01 * k), 1.0, 0.0)
                    n = n + acc
                elif mode == "novec":
                    n = n + x[0, 0] * 1e-12
                return (x, n)

            x, n = jax.lax.fori_loop(0, N, body, (x0, jnp.float32(0.0)))
            o_ref[:] = x + n
        return kernel

    for mode in ("novec", "scalar", "cond", "any8"):
        fn = jax.jit(pl.pallas_call(
            mk(mode),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
        x = jnp.full(SHAPE, 0.1, jnp.float32)
        jax.block_until_ready(fn(x))
        t0 = time.time()
        jax.block_until_ready(fn(x))
        dt = time.time() - t0
        per = dt / N * 1e6
        n_any = {"novec": 0, "scalar": 1, "cond": 1, "any8": 8}[mode]
        log(probe="sync", mode=mode, us_per_iter=round(per, 4),
            n_any=n_any,
            us_per_any=round(per / max(n_any, 1), 4))


def bounce_batches(scene, B=131072, seed=0):
    """Synthetic bounce rays: origins on random mesh surface points,
    cosine-hemisphere directions about the face normal."""
    rs = np.random.RandomState(seed)
    verts = np.asarray(scene.verts)
    tv = np.asarray(scene.tri_vidx)
    tid = rs.randint(0, tv.shape[0], B)
    p = verts[tv[tid]]
    u = rs.rand(B, 2)
    su = np.sqrt(u[:, 0:1])
    bary = np.concatenate([1 - su, su * (1 - u[:, 1:2]), su * u[:, 1:2]], 1)
    ro = (p * bary[:, :, None]).sum(1)
    fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    r1, r2 = rs.rand(B), rs.rand(B)
    st = np.sqrt(r1)
    phi = 2 * np.pi * r2
    lx, ly = st * np.cos(phi), st * np.sin(phi)
    lz = np.sqrt(np.maximum(1 - r1, 0))
    up = np.where(np.abs(fn[:, 2:3]) < 0.9,
                  np.array([[0, 0, 1.0]]), np.array([[1.0, 0, 0]]))
    t1 = np.cross(up, fn)
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-12)
    t2 = np.cross(fn, t1)
    rd = (t1 * lx[:, None] + t2 * ly[:, None] + fn * lz[:, None])
    ro = ro + fn * 1e-4
    return (jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32))


def cluster_bounce():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.scene.synthetic import terrain_scene

    scene = terrain_scene(100_000, width=512, height=256)
    ro, rd = bounce_batches(scene)
    B = ro.shape[0]
    minT = jnp.full((B,), 1e-4)
    maxT = jnp.full((B,), jnp.inf)
    for sort_mode in ("none", "origin", "dir"):
        for tile_rows in (32, 16, 8):
            try:
                tr = ClusterTracer(scene, tile_rows=tile_rows,
                                   sort_rays=sort_mode != "none",
                                   sort_mode=sort_mode if sort_mode != "none"
                                   else "origin")
                hr = jax.block_until_ready(
                    tr.closest(scene, ro, rd, minT, maxT))
                t0 = time.time()
                hr = jax.block_until_ready(
                    tr.closest(scene, ro, rd, minT, maxT))
                dt = time.time() - t0
                st = tr.trace_stats(ro, rd, minT, maxT)
                log(probe="bounce_trace", sort=sort_mode,
                    tile_rows=tile_rows,
                    us_per_ray=round(dt / B * 1e6, 3),
                    secs=round(dt, 4),
                    visits_per_tile=round(float(st[:, 0].mean()), 1),
                    leafs_per_tile=round(float(st[:, 1].mean()), 1),
                    n_tiles=int(st.shape[0]),
                    hit_frac=round(float(jnp.mean(
                        (hr.t < jnp.inf).astype(jnp.float32))), 3))
            except Exception as e:  # noqa: BLE001
                log(probe="bounce_trace", sort=sort_mode,
                    tile_rows=tile_rows,
                    err=type(e).__name__ + ": " + str(e)[:200])


def sort_tax():
    for B in (131072, 1048576):
        key = jnp.asarray(np.random.RandomState(0).randint(
            0, 1 << 30, B), jnp.int32)
        state = jnp.asarray(np.random.RandomState(1).rand(B, 32),
                            jnp.float32)

        @jax.jit
        def f(key, state):
            perm = jnp.argsort(key)
            return jnp.take(state, perm, axis=0)

        jax.block_until_ready(f(key, state))
        t0 = time.time()
        jax.block_until_ready(f(key, state))
        dt = time.time() - t0
        log(probe="sort_tax", B=B, ms=round(dt * 1e3, 3))


def wavefront_e2e():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene, bumpy_sphere_scene

    for name, scene in (("terrain100k",
                         terrain_scene(100_000, width=512, height=256)),
                        ("bumpy100k",
                         bumpy_sphere_scene(100_000, width=512,
                                            height=256))):
        st = ir.RenderSettings(width=512, height=256, spp=8, max_depth=64,
                               integrator="mis", batch_size=1 << 17)
        tr = ClusterTracer(scene)
        img, stats = render_wavefront(scene, st, tracer=tr,
                                      return_stats=True)
        t0 = time.time()
        img, stats = render_wavefront(scene, st, tracer=tr,
                                      return_stats=True)
        dt = time.time() - t0
        total = st.width * st.height * st.spp
        log(probe="wavefront_e2e", scene=name,
            mpaths=round(total / dt / 1e6, 4), secs=round(dt, 3),
            mean=float(np.asarray(img).mean()))


def mega_small_rows():
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    scene = terrain_scene(100_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 18)
    total = st.width * st.height * st.spp
    for rows in (8, 4):
        try:
            img, s = render_megakernel(scene, st, rows=rows,
                                       return_stats=True)
            img, s = render_megakernel(scene, st, rows=rows,
                                       return_stats=True)
            log(probe="mega_rows", rows=rows,
                mpaths=round(total / s["seconds"] / 1e6, 3),
                secs=round(s["seconds"], 3),
                nvisit=s["node_visits"], nleaf=s["leaf_visits"],
                nvisit_s=s["node_visits_shadow"],
                nleaf_s=s["leaf_visits_shadow"])
        except Exception as e:  # noqa: BLE001
            log(probe="mega_rows", rows=rows,
                err=type(e).__name__ + ": " + str(e)[:200])


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    microbench_sync()
    sort_tax()
    cluster_bounce()
    mega_small_rows()
    wavefront_e2e()
    with open("/root/repo/bench_records/r3_probe_b.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
