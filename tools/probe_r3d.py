"""Round-3 TPU probe batch 5: is the per-lane gather BVH walk fast NOW?

Probe batch 4 measured XLA gathers at 0.1-1.3 ns/row (the round-1 "30x
slow" folklore is dead on this toolchain). Re-measure the pure-XLA
skip-link walk (geometry/bvh.py bvh_traverse, round-1: ~0.01 Mrays/s) on
bounce batches at B = 131k and 1M, sorted and unsorted, plus the
ClusterTracer at B=1M for comparison.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    from vimg_tpu.geometry.bvh import BVHTracer
    from vimg_tpu.geometry.cluster_trace import ClusterTracer, ray_sort_key
    from vimg_tpu.scene.synthetic import terrain_scene
    from tools.probe_r3b import bounce_batches

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)

    tr_bvh = BVHTracer(scene)
    tr_cl = ClusterTracer(scene)

    for B in (131072, 1048576):
        ro, rd = bounce_batches(scene, B=B)
        minT = jnp.full((B,), 1e-4)
        maxT = jnp.full((B,), jnp.inf)
        # presort by origin-morton+octant (the cheap 0.17ms tax)
        key = ray_sort_key(ro, rd, *tr_cl.bounds, mode="origin")
        perm = jnp.argsort(key)
        ros, rds = jnp.take(ro, perm, axis=0), jnp.take(rd, perm, axis=0)

        for name, tracer, rr in (("bvh_unsorted", tr_bvh, (ro, rd)),
                                 ("bvh_sorted", tr_bvh, (ros, rds)),
                                 ("cluster", tr_cl, (ro, rd))):
            try:
                f = jax.jit(lambda ro, rd, tracer=tracer: tracer.closest(
                    scene, ro, rd, minT, maxT))
                hr = jax.block_until_ready(f(*rr))
                t0 = time.time()
                hr = jax.block_until_ready(f(*rr))
                dt = time.time() - t0
                log(probe="walk_v2", tracer=name, B=B,
                    secs=round(dt, 4),
                    us_per_ray=round(dt / B * 1e6, 4),
                    mrays=round(B / dt / 1e6, 2),
                    hit_frac=round(float(jnp.mean(
                        (hr.t < jnp.inf).astype(jnp.float32))), 3))
            except Exception as e:  # noqa: BLE001
                log(probe="walk_v2", tracer=name, B=B,
                    err=type(e).__name__ + ": " + str(e)[:300])
        # occlusion walk too (shadow economics)
        try:
            f = jax.jit(lambda ro, rd: tr_bvh.occluded(
                scene, ro, rd, minT, jnp.full((B,), 3.0)))
            occ = jax.block_until_ready(f(ros, rds))
            t0 = time.time()
            occ = jax.block_until_ready(f(ros, rds))
            dt = time.time() - t0
            log(probe="walk_v2", tracer="bvh_sorted_occl", B=B,
                secs=round(dt, 4), us_per_ray=round(dt / B * 1e6, 4),
                mrays=round(B / dt / 1e6, 2))
        except Exception as e:  # noqa: BLE001
            log(probe="walk_v2", tracer="bvh_sorted_occl", B=B,
                err=type(e).__name__ + ": " + str(e)[:300])

    with open("/root/repo/bench_records/r3_probe_d.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
