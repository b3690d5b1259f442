"""Round-3 TPU probe batch 8: surgical ablation of the cluster-tree walk.

Variants of the cluster closest-walk kernel on a fixed sorted bounce
batch (131k rays, 100k-tri terrain, tile_rows=32):

  full       — the real walk (baseline, ~0.23 s measured)
  no_tri     — leaf cond kept, test16 bodies emptied (isolates tri work)
  no_cond    — no leaf branch at all: pure interior walk + skip advance
  lean_carry — no_cond with carry reduced to (n, bt)
  no_slab    — lean_carry with the slab test replaced by a trivial
               compare (isolates the 6-plane slab chain itself)

Each prints us/visit given the known visit count from trace_stats.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def make_kernel(n_nodes, max_k, variant):
    ROW16 = 16
    rpc = max_k * ROW16 // 128
    n_sub = max(max_k // 16, 1)

    def kernel(aabb_ref, cid_ref, skip_ref, tri_ref,
               rox, roy, roz, rdx, rdy, rdz, tmin_ref, tmax_ref,
               bt_ref, nv_ref):
        ox, oy, oz = rox[:], roy[:], roz[:]
        dx, dy, dz = rdx[:], rdy[:], rdz[:]
        minT = tmin_ref[:]
        idx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        idy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        idz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
        oix = ox * idx
        oiy = oy * idy
        oiz = oz * idz

        lean = variant in ("lean_carry", "no_slab")

        def cond(carry):
            return carry[0] < n_nodes

        def body(carry):
            if lean:
                n, bt0, nv0 = carry
            else:
                n, bt0, code0, bu0, bv0, nv0 = carry
            cid = cid_ref[n // 128, n % 128]
            c = jnp.maximum(cid, 0)

            def tconst(k, j):
                flat = k * ROW16 + j
                return tri_ref[c * rpc + flat // 128, flat % 128]

            arow = n // 16
            acol = (n % 16) * 8
            if variant == "no_slab":
                live = (bt0 + aabb_ref[arow, acol]) > 0.0
            else:
                bxl = aabb_ref[arow, acol + 0]
                byl = aabb_ref[arow, acol + 1]
                bzl = aabb_ref[arow, acol + 2]
                bxh = aabb_ref[arow, acol + 3]
                byh = aabb_ref[arow, acol + 4]
                bzh = aabb_ref[arow, acol + 5]
                t0x = bxl * idx - oix
                t1x = bxh * idx - oix
                t0y = byl * idy - oiy
                t1y = byh * idy - oiy
                t0z = bzl * idz - oiz
                t1z = bzh * idz - oiz
                tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                              jnp.minimum(t0y, t1y)),
                                  jnp.maximum(jnp.minimum(t0z, t1z), minT))
                tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.minimum(jnp.maximum(t0z, t1z), bt0))
                live = tin <= tout
            any_live = jnp.any(live)

            def test16(sub0, carry):
                bt, code, bu, bv = carry
                if variant == "no_tri":
                    return bt, code, bu, bv
                for k in range(sub0, min(sub0 + 16, max_k)):
                    nx = tconst(k, 0)
                    ny = tconst(k, 1)
                    nz = tconst(k, 2)
                    d0 = tconst(k, 3)
                    m1x = tconst(k, 4)
                    m1y = tconst(k, 5)
                    m1z = tconst(k, 6)
                    c1 = tconst(k, 7)
                    m2x = tconst(k, 8)
                    m2y = tconst(k, 9)
                    m2z = tconst(k, 10)
                    c2 = tconst(k, 11)
                    ro_n = ox * nx + oy * ny + oz * nz
                    rd_n = dx * nx + dy * ny + dz * nz
                    par = jnp.abs(rd_n) < 1e-22
                    t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                    u = (ox * m1x + oy * m1y + oz * m1z - c1
                         + t * (dx * m1x + dy * m1y + dz * m1z))
                    v = (ox * m2x + oy * m2y + oz * m2z - c2
                         + t * (dx * m2x + dy * m2y + dz * m2z))
                    hit = (~par & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                           & (t >= minT) & (t < bt) & live)
                    code = jnp.where(hit, (c * max_k + k).astype(
                        jnp.float32), code)
                    bu = jnp.where(hit, u, bu)
                    bv = jnp.where(hit, v, bv)
                    bt = jnp.where(hit, t, bt)
                return bt, code, bu, bv

            def tri_tests(carry):
                for s in range(n_sub):
                    carry = jax.lax.cond(
                        any_live, functools.partial(test16, s * 16),
                        lambda cr: cr, carry)
                return carry

            is_leaf = cid >= 0
            nv = nv0 + 1.0
            if lean:
                bt = bt0
            else:
                if variant == "no_cond":
                    bt, code, bu, bv = bt0, code0, bu0, bv0
                else:
                    bt, code, bu, bv = jax.lax.cond(
                        any_live & is_leaf, tri_tests, lambda cr: cr,
                        (bt0, code0, bu0, bv0))
            n_next = jnp.where(any_live, n + 1,
                               skip_ref[n // 128, n % 128])
            if lean:
                return n_next, bt, nv
            return n_next, bt, code, bu, bv, nv

        z = jnp.zeros(ox.shape, jnp.float32)
        if lean:
            init = (jnp.int32(0), tmax_ref[:], jnp.float32(0.0))
            _, bt, nv = jax.lax.while_loop(cond, body, init)
        else:
            init = (jnp.int32(0), tmax_ref[:], z - 1.0, z, z,
                    jnp.float32(0.0))
            _, bt, code, bu, bv, nv = jax.lax.while_loop(cond, body, init)
        bt_ref[:] = bt
        nv_ref[:] = jnp.zeros((8, 128), jnp.float32) + nv

    return kernel


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer, ray_sort_key
    from vimg_tpu.scene.synthetic import terrain_scene
    from tools.probe_r3b import bounce_batches

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    tr = ClusterTracer(scene, tile_rows=32)
    B = 131072
    ro, rd = bounce_batches(scene, B=B)
    key = ray_sort_key(ro, rd, *tr.bounds, mode="origin")
    perm = np.asarray(jnp.argsort(key))
    ro = np.asarray(ro)[perm]
    rd = np.asarray(rd)[perm]

    tile_rows = 32
    tile = tile_rows * 128
    n_tiles = B // tile
    shape = jax.ShapeDtypeStruct((B // 128, 128), jnp.float32)
    ray_spec = pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def pack(x):
        return jnp.asarray(x).reshape(-1, 128)

    args = ([pack(ro[:, k]) for k in range(3)]
            + [pack(rd[:, k]) for k in range(3)]
            + [pack(np.full(B, 1e-4, np.float32)),
               pack(np.full(B, np.inf, np.float32))])

    nodes = tr.node_tables
    total_visits = None
    for variant in ("full", "no_tri", "no_cond", "lean_carry", "no_slab"):
        kern = make_kernel(tr.data.n_nodes, tr.data.max_k, variant)
        fn = jax.jit(pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 8,
            out_shape=(shape,
                       jax.ShapeDtypeStruct((n_tiles * 8, 128),
                                            jnp.float32)),
            out_specs=(ray_spec,
                       pl.BlockSpec((8, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
        ))
        out = jax.block_until_ready(fn(*nodes, tr.tri_rows, *args))
        t0 = time.time()
        out = jax.block_until_ready(fn(*nodes, tr.tri_rows, *args))
        dt = time.time() - t0
        nv = float(np.asarray(out[1]).reshape(n_tiles, 8, 128)[:, 0, 0]
                   .sum())
        if total_visits is None:
            total_visits = nv
        log(variant=variant, secs=round(dt, 4), visits=nv,
            us_per_visit=round(dt / max(nv, 1) * 1e6, 3))

    with open("/root/repo/bench_records/r3_probe_walkablate.json",
              "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
