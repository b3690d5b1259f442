"""Round-3 TPU probe batch 4: what actually costs 0.6us per tree-walk
visit, and how fast are XLA per-lane gathers really?

1. Dynamic scalar SMEM read cost (1/4/8/16 reads per loop iteration,
   data-dependent indices so nothing hoists).
2. Same from a packed layout (one i32 read + bit unpack vs many reads).
3. XLA gather throughput: jnp.take of 131k/1M rows from small/large
   tables (material fetch, texture fetch, hit_info shapes).
4. intersect.hit_info cost on a 131k mesh batch (the wavefront's
   per-superstep XLA tax).
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


def smem_read_cost():
    N = 20000
    SHAPE = (8, 128)

    def mk(n_reads, packed=False):
        def kernel(x_ref, tab_ref, o_ref):
            x0 = x_ref[:]

            def body(i, carry):
                x, s = carry
                x = x * 1.0000001
                idx = (i * 7 + s) % 4096     # depends on s: serial chain
                if packed:
                    acc = jnp.int32(0)
                    for k in range(n_reads // 2):
                        w = tab_ref[(idx + k) % 4096]
                        acc = acc + (w & 0xFFFF) + (w >> 16)
                    s = (s + acc) % 65536
                else:
                    acc = jnp.int32(0)
                    for k in range(n_reads):
                        acc = acc + tab_ref[(idx + k) % 4096]
                    s = (s + acc) % 65536
                return (x, s)

            x, s = jax.lax.fori_loop(0, N, body, (x0, jnp.int32(0)))
            o_ref[:] = x + s.astype(jnp.float32) * 1e-20
        return kernel

    tab = np.arange(4096, dtype=np.int32) % 7
    for packed in (False, True):
        for n_reads in ((2, 4, 8, 16) if not packed else (4, 8, 16)):
            fn = jax.jit(pl.pallas_call(
                mk(n_reads, packed),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
            x = jnp.full(SHAPE, 0.1, jnp.float32)
            jax.block_until_ready(fn(x, tab))
            t0 = time.time()
            jax.block_until_ready(fn(x, tab))
            per = (time.time() - t0) / N * 1e6
            log(probe="smem_read", packed=packed, n_reads=n_reads,
                us_per_iter=round(per, 4),
                ns_per_read=round(per / n_reads * 1e3, 1))


def xla_gather():
    for B in (131072, 1048576):
        for rows, width, name in ((4, 16, "mat_table"),
                                  (100_000, 4, "tri_attrs"),
                                  (262_144, 4, "texture512")):
            tab = jnp.asarray(
                np.random.RandomState(0).rand(rows, width), jnp.float32)
            idx = jnp.asarray(np.random.RandomState(1).randint(
                0, rows, B), jnp.int32)

            @jax.jit
            def f(tab, idx):
                return jnp.take(tab, idx, axis=0).sum(axis=-1)

            jax.block_until_ready(f(tab, idx))
            t0 = time.time()
            for _ in range(5):
                r = f(tab, idx)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / 5
            log(probe="xla_gather", B=B, table=name, rows=rows,
                width=width, ms=round(dt * 1e3, 3),
                ns_per_row=round(dt / B * 1e9, 1))


def hit_info_cost():
    import jax
    from vimg_tpu.geometry import intersect
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.scene.synthetic import terrain_scene
    from tools.probe_r3b import bounce_batches

    scene = terrain_scene(100_000, width=512, height=256)
    ro, rd = bounce_batches(scene)
    B = ro.shape[0]
    minT = jnp.full((B,), 1e-4)
    maxT = jnp.full((B,), jnp.inf)
    tr = ClusterTracer(scene)
    hr = jax.block_until_ready(tr.closest(scene, ro, rd, minT, maxT))

    @jax.jit
    def hi_fn(ro, rd, hr):
        hi = intersect.hit_info(scene, ro, rd, hr)
        return hi.p.sum() + hi.n_s.sum() + hi.n_g.sum()

    jax.block_until_ready(hi_fn(ro, rd, hr))
    t0 = time.time()
    for _ in range(5):
        r = hi_fn(ro, rd, hr)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 5
    log(probe="hit_info", B=B, ms=round(dt * 1e3, 3),
        us_per_lane=round(dt / B * 1e6, 3))


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    smem_read_cost()
    xla_gather()
    hit_info_cost()
    with open("/root/repo/bench_records/r3_probe_c.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
